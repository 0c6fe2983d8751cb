"""Unit tests for prefix routing (reference P2-P5), mirroring the
reference's only unit suite (test/testCommon.js:8-27) plus the fail-open
filename-filter semantics SURVEY §7 flags as easy to get backwards."""

from __future__ import annotations

from aws_lambda_redshift_loader_spark.sources.routing import (
    LoadConfig,
    filename_filter,
    resolve_config,
    shorten_prefix,
    transform_hive_style_prefix,
)

# The reference's fixtures (test/testCommon.js:3-4).
PREFIXES = ["bucket/a=1/b=2/bob", "bucket/z=200/y=whatever/dude"]
SUPPRESS = ["bucket/a=1/b=2/bob"]


def test_hive_transform():
    # testCommon.js "Should transform prefix"
    assert transform_hive_style_prefix(PREFIXES[1], SUPPRESS) == "bucket/z=*/y=*/dude"


def test_hive_transform_suppressed():
    # testCommon.js "Should not transform prefix"
    assert transform_hive_style_prefix(PREFIXES[0], SUPPRESS) == PREFIXES[0]


def test_hive_transform_suppress_all():
    # testCommon.js "Should suppress all wildcard transforms" (`*` = all)
    assert transform_hive_style_prefix(PREFIXES[0], ["*"]) == PREFIXES[0]


def test_hive_transform_no_suppression():
    assert transform_hive_style_prefix(PREFIXES[0]) == "bucket/a=*/b=*/bob"


def test_hive_value_with_empty_value():
    # `name=` (empty value) is still a hive segment per the regex.
    assert transform_hive_style_prefix("b/part=") == "b/part=*"


def test_shorten_prefix():
    # shortenPrefix (common.js:28-34): drop last segment; None at root.
    assert shorten_prefix("bucket/input/data") == "bucket/input"
    assert shorten_prefix("bucket/input") == "bucket"
    assert shorten_prefix("bucket") is None


def test_resolve_config_longest_prefix_wins():
    # Hierarchical matching table (README.md:267-273): most specific first.
    configs = {
        "bucket/input": LoadConfig(s3_prefix="bucket/input"),
        "bucket/input/sales": LoadConfig(s3_prefix="bucket/input/sales"),
    }
    hit = resolve_config("bucket/input/sales/eu/2024", configs)
    assert hit is configs["bucket/input/sales"]
    hit = resolve_config("bucket/input/marketing/us", configs)
    assert hit is configs["bucket/input"]
    assert resolve_config("otherbucket/x", configs) is None


def test_filename_filter_match_and_miss():
    # filenameFilterRegex gate (index.js:212-234).
    assert filename_filter("input/upload.csv", r"\.csv$")
    assert not filename_filter("input/upload.json", r"\.csv$")
    assert filename_filter("anything", None)


def test_filename_filter_fail_open_on_bad_regex():
    # Malformed regex must INCLUDE the file (index.js:216-228 catch path) —
    # the reference logs and proceeds rather than dropping data.
    assert filename_filter("input/upload.csv", r"([unclosed")


def test_suppression_is_exact_membership_not_startswith():
    # common.js:39-41 uses suppressionList.includes(...) — a suppressed
    # prefix exempts ITSELF only; sub-paths still transform.
    child = PREFIXES[0] + "/c=3"
    assert (
        transform_hive_style_prefix(child, SUPPRESS) == "bucket/a=*/b=*/bob/c=*"
    )


def test_parse_suppression_list_string():
    # testCommon.js:10-13 "Should parse string suppression lists correctly"
    from aws_lambda_redshift_loader_spark.sources.routing import parse_suppression_list

    assert (
        parse_suppression_list("bucket/a=1/b=2/bob, bucket/z=200/y=whatever/dude")
        == PREFIXES
    )
    assert parse_suppression_list("*") == ["*"]
    assert parse_suppression_list(True) == ["*"]
    assert parse_suppression_list(None) is None


def test_hive_transform_suppress_true_boolean():
    # testCommon.js:15-17: transformHiveStylePrefix(true) → unchanged.
    assert transform_hive_style_prefix(PREFIXES[0], True) == PREFIXES[0]


def test_hive_transform_valueless_equals_segment():
    # common.js:43-50 replace(/\=(.*)/,"=*"): any segment containing '='
    # rewrites from the first '=' — including a leading-'=' segment.
    assert transform_hive_style_prefix("b/=orphan/x") == "b/=*/x"
    assert transform_hive_style_prefix("b/a=b=c/x") == "b/a=*/x"


def test_reference_resolve_config_fixture():
    # test/testResolveConfig.js:28 end-to-end: hive-transform the deep
    # key, then resolve by successive prefix shortening to a config
    # registered at the wildcard prefix.
    key = (
        "energy-streaming-demo/data/csv/capture_date=2015-09-28/"
        "capture_time=15/test/part-00000"
    )
    wild = transform_hive_style_prefix(key)
    assert wild == (
        "energy-streaming-demo/data/csv/capture_date=*/capture_time=*/"
        "test/part-00000"
    )
    cfg_prefix = "energy-streaming-demo/data/csv/capture_date=*/capture_time=*"
    configs = {cfg_prefix: LoadConfig(s3_prefix=cfg_prefix)}
    hit = resolve_config(wild, configs)
    assert hit is configs[cfg_prefix]
