"""Doc-vs-measurement consistency: README throughput claims match PERF.jsonl.

VERDICT r3/r4 flagged the same failure twice: a README headline number
measured under one configuration while the shipped defaults measured lower.
This makes the guard structural — the README's "current" throughput claim is
wrapped in `<!-- PERF:<metric> -->value<!-- /PERF -->` markers and must equal
the LAST PERF.jsonl line for that metric (the per-commit measurement trail),
so a default-flip without a fresh measured line fails the gate.
"""

import json
import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _last_perf(metric):
    last = None
    with open(os.path.join(ROOT, "PERF.jsonl")) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("bench") == metric:
                last = rec
    return last


def test_readme_throughput_matches_last_perf_line():
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()
    claims = re.findall(
        r"<!-- PERF:([\w_]+) -->([\d.]+)<!-- /PERF -->", readme
    )
    assert claims, "README lost its PERF-marked throughput claim"
    for metric, value in claims:
        rec = _last_perf(metric)
        assert rec is not None, f"no PERF.jsonl line for {metric}"
        assert float(value) == float(rec["value"]), (
            f"README claims {metric}={value} but the last measured "
            f"PERF.jsonl line says {rec['value']} — re-measure (python "
            f"bench.py, append the line) or fix the README marker"
        )
