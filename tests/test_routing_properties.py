"""Property-based tests (hypothesis) for the routing pure functions —
the invariants the reference's behavior implies but its 4-assertion unit
suite (test/testCommon.js) never pins down."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from aws_lambda_redshift_loader_spark.sources.routing import (
    LoadConfig,
    filename_filter,
    resolve_config,
    shorten_prefix,
    transform_hive_style_prefix,
)

segment = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="-_."),
    min_size=1,
    max_size=12,
)
prefixes = st.lists(segment, min_size=1, max_size=6).map("/".join)


@given(prefixes)
def test_hive_transform_idempotent(p):
    """Wildcarding twice equals wildcarding once (`name=*` is itself a
    hive segment and must map to itself)."""
    once = transform_hive_style_prefix(p)
    assert transform_hive_style_prefix(once) == once


@given(prefixes)
def test_hive_transform_preserves_shape(p):
    """Same number of segments; non-hive segments unchanged."""
    out = transform_hive_style_prefix(p)
    a, b = p.split("/"), out.split("/")
    assert len(a) == len(b)
    for seg_in, seg_out in zip(a, b):
        if "=" not in seg_in:
            assert seg_out == seg_in


@given(prefixes)
def test_suppressed_transform_is_identity(p):
    assert transform_hive_style_prefix(p, ["*"]) == p
    assert transform_hive_style_prefix(p, [p]) == p


@given(prefixes)
def test_shorten_terminates_at_root(p):
    """Repeated shortening strictly shrinks and ends with None — the
    resolveConfig loop (index.js:131-170) can never spin."""
    seen = set()
    cur: str | None = p
    while cur is not None:
        assert cur not in seen
        seen.add(cur)
        nxt = shorten_prefix(cur)
        if nxt is not None:
            assert len(nxt) < len(cur)
        cur = nxt
    assert len(seen) == p.count("/") + 1


@given(prefixes, st.integers(min_value=0, max_value=5))
def test_resolve_finds_longest_configured_ancestor(p, cut):
    """If any ancestor of p is configured, resolve returns the LONGEST
    configured ancestor (README.md:267-273 matching table)."""
    ancestors = []
    cur: str | None = p
    while cur is not None:
        ancestors.append(cur)
        cur = shorten_prefix(cur)
    configured = ancestors[min(cut, len(ancestors) - 1) :]
    configs = {a: LoadConfig(s3_prefix=a) for a in configured}
    hit = resolve_config(p, configs)
    assert hit is configs[configured[0]]  # nearest == longest ancestor


@given(st.text(max_size=40))
def test_filename_filter_never_raises(key):
    """Fail-open contract: no (key, pattern) pair may raise — a malformed
    pattern must include the file (index.js:216-228)."""
    for pattern in [None, r"\.csv$", "([unclosed", "*??invalid", ""]:
        assert filename_filter(key, pattern) in (True, False)
    assert filename_filter(key, "([unclosed") is True
