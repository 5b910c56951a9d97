package graft.service

/** Standalone launcher for the deposit service (the reference's
  * cmd/service/main.go): `runMain graft.service.ServeMain [port]`. */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val spark = graft.GraftSession.local("graft-deposit-service")
    spark.sparkContext.setLogLevel("WARN")
    val svc = new DepositService(spark, port)
    println(s"deposit service listening on :${svc.boundPort} " +
      "(POST /deposit, GET /check/{wallet_id})")
    Thread.currentThread().join()
  }
}
