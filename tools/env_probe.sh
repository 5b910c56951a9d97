#!/bin/sh
# Per-round environment probe for the parked integration items
# (VERDICT r11 task 7). One line per capability; append the summary line
# to PERF.md's round section. Exit code is always 0 — the probe reports,
# it does not gate.
#
#   sh tools/env_probe.sh
#
# Capabilities probed:
#  - kafka:     a broker listening on localhost:9092 (reference topology,
#               /root/reference/docker-compose.yml:10-26) would unpark the
#               live Kafka leg of stream_check*.
#  - protobuf:  the spark-protobuf datasource/function jar would unpark
#               wire-compatible from_protobuf/to_protobuf (today served by
#               the hand-rolled graft.serde.ProtoWire codec).
#  - avro:      the spark-avro datasource module (avro core alone is NOT
#               enough for read.format("avro")).

ok=""
miss=""

# Kafka broker on :9092 — pure-shell TCP probe, ~1s timeout.
if (exec 3<>/dev/tcp/127.0.0.1/9092) 2>/dev/null; then
  exec 3>&- 3<&- 2>/dev/null
  ok="$ok kafka"
else
  miss="$miss kafka"
fi

jars=/opt/spark/jars
if ls "$jars"/spark-protobuf*.jar >/dev/null 2>&1; then
  ok="$ok spark-protobuf"
else
  miss="$miss spark-protobuf"
fi

if ls "$jars"/spark-avro*.jar >/dev/null 2>&1; then
  ok="$ok spark-avro"
else
  miss="$miss spark-avro"
fi

date_s=$(date -u +%Y-%m-%dT%H:%M:%SZ)
echo "env_probe $date_s: available:[${ok# }] blocked:[${miss# }]"
if [ -n "$ok" ]; then
  echo "  -> a capability flipped: promote the parked wire-parity item(s) (VERDICT r11 'What's missing')"
fi
exit 0
