"""One scaling repetition (8-core + 32-core pinned frontier runs), appended
as a JSON line to tools/scaling_runs.jsonl. Run 3x, then summarize medians.
Kept as a tool so future rounds can regenerate BASELINE.md numbers."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "scaling_runs.jsonl")

if __name__ == "__main__":
    mult = int(os.environ.get("SPARK_GRAFT_URL_MULT", "30"))
    rec = {}
    for c in (8, 32):
        rec[str(c)] = bench._pinned_frontier_run(c, "/root/testdata/sf0.1", mult)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
