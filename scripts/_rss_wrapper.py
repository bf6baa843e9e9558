"""Internal: run the sezkp_tpu CLI in-process and report this process's own
peak RSS to a file (used by scale_streaming_sublinear.py for per-stage RSS)."""

import json
import resource
import sys

out_path = sys.argv[1]
args = sys.argv[2:]

from sezkp_tpu import cli

rc = cli.main(args)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
with open(out_path, "w") as f:
    json.dump({"rss_kib": peak, "rc": rc}, f)
sys.exit(rc or 0)
