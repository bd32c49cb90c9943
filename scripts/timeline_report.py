"""Summarize a DCA_TPU_TIMELINE JSONL into a per-epoch stage breakdown
that SUMS to the measured epoch wall time (VERDICT r4 weak item 3).

Usage: python scripts/timeline_report.py /path/to/timeline.jsonl [epoch]

Main-thread accounting per epoch:
  wait      blocked on the prefetch thread (prep+ship not yet hidden)
  dispatch  jit dispatch of part scans/evals (may block on device queue)
  fetch     epoch-end bulk loss sync
  other     epoch - (wait + dispatch + fetch): python glue, task building
Prefetch-thread totals (overlapped with the above, not additive):
  prep      host payload build        ship  upload + scatter dispatch
"""

import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    only_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else None
    rows = [json.loads(l) for l in open(path) if l.strip()]
    epochs = sorted({r["epoch"] for r in rows})
    for e in epochs:
        if only_epoch is not None and e != only_epoch:
            continue
        ev = [r for r in rows if r["epoch"] == e]
        by = defaultdict(float)
        cnt = defaultdict(int)
        for r in ev:
            by[r["stage"]] += r["dur"]
            cnt[r["stage"]] += 1
        epoch_wall = by.pop("epoch", 0.0)
        main_sum = by.get("wait", 0) + by.get("dispatch", 0) + by.get("fetch", 0)
        print(f"epoch {e}: wall {epoch_wall:.1f}s  "
              f"(main accounted {main_sum:.1f}s, "
              f"other {epoch_wall - main_sum:.1f}s)")
        for stage in ("wait", "dispatch", "fetch", "prep", "ship"):
            if stage in by:
                tag = ("main" if stage in ("wait", "dispatch", "fetch")
                       else "thread")
                print(f"  {stage:9s} {by[stage]:8.1f}s  x{cnt[stage]:<4d} "
                      f"[{tag}]")
        # slowest individual waits — which parts stall the pipeline
        waits = sorted((r for r in ev if r["stage"] == "wait"),
                       key=lambda r: -r["dur"])[:5]
        if waits:
            print("  top waits: " + ", ".join(
                f"part {r['part']}({r['kind']}) {r['dur']:.1f}s"
                for r in waits))


if __name__ == "__main__":
    main()
