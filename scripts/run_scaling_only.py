"""Run ONLY bench.py's scaling section (the redraw hunt) and write the
result JSON to the path given as argv[1] (default /tmp/scaling_hunt.json).

Used when hunting for a certified-clean scaling window without paying the
headline-query passes each draw. Same code path as the recorded bench:
imports bench.run_scaling directly.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_hunt.json"
extra: dict = {}
bench.run_scaling(extra)
with open(out_path, "w") as f:
    json.dump(extra, f, indent=1)
s = extra.get("scaling", {})
print(
    "RESULT efficiency=%s quality=%r draws=%s"
    % (s.get("efficiency"), s.get("window_quality"), s.get("draws_taken"))
)
