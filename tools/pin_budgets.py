#!/usr/bin/env python3
"""Regenerate tools/bench_budgets.json so EVERY registered query carries a
pinned clean median — the per-query budget bench_triage.py enforces (a
draw fails when any query exceeds 2x its pin, even if the total passes,
so a creeping regression cannot hide under total-level weather).

  python3 tools/pin_budgets.py <clean_draw.json> [--write]

Rules:
 - the pin for a query is its median in the given CLEAN draw (triage the
   draw first; pinning a dirty draw bakes host noise into the gate);
 - queries absent from the draw keep their existing hand-pinned budget
   (the registration-time pin for brand-new surface);
 - the `_*` note keys are preserved, and `_pinned_from` records the
   draw's total/nqueries so the provenance of the table is in-repo.

Without --write, prints the would-be table and the diff summary only.
"""
import json
import os
import sys


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    draw_path = sys.argv[1]
    write = "--write" in sys.argv
    here = os.path.dirname(__file__)
    budget_path = os.path.join(here, "bench_budgets.json")

    with open(draw_path) as f:
        draw = json.load(f)
    queries = {k: v for k, v in (draw.get("queries") or {}).items()
               if isinstance(v, (int, float))}
    if not queries:
        sys.exit("draw has no per-query timings (pass bench_full.json)")

    old = {}
    if os.path.exists(budget_path):
        with open(budget_path) as f:
            old = json.load(f)

    out = {k: v for k, v in old.items() if k.startswith("_")}
    out["_pinned_from"] = (f"clean draw total {draw.get('value')}s / "
                           f"{len(queries)} queries (see PERF.md)")
    kept = 0
    for k, v in sorted(old.items()):
        if not k.startswith("_") and k not in queries:
            out[k] = v  # hand pin for surface newer than the draw
            kept += 1
    for k in sorted(queries):
        out[k] = round(queries[k], 4)

    print(f"pinning {len(queries)} medians from {draw_path}; "
          f"keeping {kept} hand pins for queries not in the draw")
    if write:
        with open(budget_path, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
        print(f"wrote {budget_path}")
    else:
        print("(dry run; pass --write to update tools/bench_budgets.json)")


if __name__ == "__main__":
    main()
