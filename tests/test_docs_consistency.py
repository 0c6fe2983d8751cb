"""Docs-drift gates.

The r15 and r16 verdicts both flagged the same defect class: the
ROADMAP round-header query count went stale when queries landed after
the header was written. This kills the class, not the instance — the
LAST round section's `Registered queries: A → **B ...**` line is
checked against the live registry at every pytest run (i.e. at commit
time, since the suite gates commits), as is its `(K new ...)` delta
and QUERIES.md's generated count line.
"""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_count() -> int:
    from aws_lambda_redshift_loader_spark.plans.registry import load_all

    return len(load_all())


def _last_round_section() -> str:
    with open(os.path.join(REPO, "ROADMAP.md")) as fh:
        text = fh.read()
    parts = re.split(r"(?m)^## Round \d+ ", text)
    assert len(parts) > 1, "ROADMAP.md has no '## Round N' sections"
    return parts[-1]


def test_roadmap_round_header_count_matches_registry():
    section = _last_round_section()
    m = re.search(
        r"Registered queries: (\d+) → \*\*(\d+)", section
    )
    assert m, (
        "last ROADMAP round section lacks a 'Registered queries: "
        "A → **B ...**' header line — add one (it is CI-checked)"
    )
    start, now = int(m.group(1)), int(m.group(2))
    live = _registry_count()
    assert now == live, (
        f"ROADMAP round-header count {now} is stale: the live registry "
        f"has {live} queries. Update the header in the same commit that "
        "registers/removes queries."
    )
    mnew = re.search(r"\*\*\d+[^(]*\((\d+) new", section)
    if mnew:
        assert int(mnew.group(1)) == now - start, (
            f"ROADMAP '(K new)' delta {mnew.group(1)} != {now} - {start}"
        )


def test_queries_md_count_matches_registry():
    path = os.path.join(REPO, "QUERIES.md")
    if not os.path.exists(path):
        pytest.skip("QUERIES.md not generated")
    with open(path) as fh:
        text = fh.read()
    m = re.search(r"^(\d+) registered queries", text, re.M)
    assert m, "QUERIES.md lacks the generated count line"
    live = _registry_count()
    assert int(m.group(1)) == live, (
        f"QUERIES.md says {m.group(1)} queries but the registry has "
        f"{live} — rerun `python gen_queries_md.py`"
    )
    # One table line per query, so the doc can't silently drop names.
    rows = re.findall(r"^\| \d+ \| `", text, re.M)
    assert len(rows) == live, (
        f"QUERIES.md lists {len(rows)} query rows vs {live} registered"
    )
