"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named
query builder ``(spark, sf_dir) -> DataFrame`` plus (when the semantics are
ANSI-SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. The driver hash-compares the two at sf=0.01, so:

- every computed column is aliased IDENTICALLY on both sides;
- float aggregates go through DECIMAL so both engines produce bit-identical
  doubles (double SUM order is nondeterministic under parallelism);
- timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings or DATEs, with the
  Spark session pinned to UTC (session.tune).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

# Oracles whose SQL embeds ANOTHER query's oracle (e.g. hybrid RRF nests
# bm25_topk + embedding_topk_bruteforce) register a zero-arg CALLABLE here
# instead of a string, so building the SQL is deferred until load_all() has
# imported every module. Evaluating such an oracle at decoration time made
# `import operators.text` order-dependent (it crashed unless
# operators.similarity happened to be imported first).
_LAZY_ORACLES: dict[str, Callable[[], str]] = {}


def register(
    name: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under ``name`` with an optional oracle.

    ``oracle`` may be a DuckDB SQL string or a zero-arg callable returning
    one; callables are resolved by :func:`load_all` after every operator
    module has been imported (cross-module oracle composition)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        sql: str | None
        if callable(oracle):
            _LAZY_ORACLES[name] = oracle
            sql = None  # placeholder until load_all resolves it
        else:
            sql = oracle
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=sql, doc=fn.__doc__ or "")
        return fn

    return deco


def _resolve_lazy_oracles() -> None:
    """Materialize deferred oracle SQL once all modules are registered.

    Constraint: a callable oracle may nest only STRING-oracle queries —
    nesting another deferred oracle would read its ``None`` placeholder
    (resolution order is arbitrary). The tripwire below catches that
    mistake loudly instead of shipping ``... AS (None) ...`` to DuckDB.
    It matches the word ``None`` anywhere in the rendered SQL (not just
    the parenthesized ``(None)`` form) so an unresolved nested oracle
    interpolated without surrounding parentheses — e.g.
    ``f"WITH {other.oracle}, ..."`` → ``WITH None, ...`` — is caught
    too. No legitimate oracle in this repo spells the bare word
    ``None`` (SQL NULL is ``NULL``); if one ever must, quote it so the
    word-boundary regex does not fire on an f-string artifact."""
    import dataclasses
    import re

    while _LAZY_ORACLES:
        name, thunk = _LAZY_ORACLES.popitem()
        sql = thunk()
        assert sql is not None and not re.search(r"\bNone\b", sql), (
            f"lazy oracle for {name!r} embedded an unresolved oracle "
            "(callable oracles may nest only string-oracle queries)"
        )
        QUERIES[name] = dataclasses.replace(QUERIES[name], oracle=sql)


# The driver's correctness harness walks the registry in insertion order and
# (round 1 evidence: CORRECTNESS_r01.json holds exactly entries 0-49) verifies
# a bounded prefix of it. Order therefore matters operationally: queries whose
# CODE CHANGED since their own last green driver verdict go first (those
# verdicts describe code that no longer exists), then everything else
# stalest-first, so every green row in the next CORRECTNESS file describes
# current code. Since round 7 the ordering is DERIVED MECHANICALLY
# (round-6 VERDICT item 2 — a hand-kept list let two-line micro-fixes slip
# the rotation): `_derive_order` reads the repo's CORRECTNESS_r*.json files
# for each query's last green round, finds that round's verdict commit in
# git history, and git-diffs it against the working tree; any overlap
# between a diff hunk and the query's current source span (or a
# module-level hunk in the query's file — shared helpers/constants count
# conservatively as touching every query in the module) marks the query
# changed. `_FIRST` remains the hand-checked fallback when git or the
# correctness files are unavailable. The local tests/test_oracle.py sweep
# covers ALL queries every session regardless of this ordering.
_FIRST = [
    # round-17 new queries (no prior correctness row)
    "stream_srm",
    "mde_power_ab",
    "split_centroid_similarity",
    "flesch_readability_profile",
    "stream_winsorized",
    "stream_mann_whitney",
    "winsorized_quality_ab",
    "stream_did",
    "stream_welch_t",
    "permutation_test_ab",
    "diff_in_differences",
    "welch_t_ab",
    "srm_check",
    "stream_cusum",
    "bootstrap_quality_ci",
    "cuped_adjusted_ab",
    "mann_whitney_quality_ab",
    "stream_sprt",
    "stream_community_conductance",
    # round-11 new queries (no prior correctness row)
    "max_drawdown_by_user",
    "seasonal_outliers",
    "bm25_prf_topk",
    "curation_funnel_report",
    "kcore_token_graph",
    "k_anonymity_audit",
    "embedding_multiprobe_lsh",
    "kmv_difference_estimate",
    "minhash_estimate_error",
    "lsh_threshold_sweep",
    "quality_rule_ablation",
    "ann_refine_topk",
    "volume_shipping_pairs",
    "market_share_by_year",
    "returned_item_ranking",
    "ship_delay_priority_mix",
    "large_order_customers",
    "disjunctive_part_revenue",
    "waiting_supplier_ranking",
    "idle_balance_customers",
    # round-10 late additions (no prior correctness row)
    "bloom_join_prune",
    "dataset_split_assign",
    "kmv_join_distinct",
    "embedding_filtered_topk",
    "ann_recall_eval",
    "stream_cluster_sizes",
    # round-10 new queries (no prior correctness row)
    "stream_kmv_distinct",
    "stream_heavy_hitters_cms",
    "kmv_set_overlap",
    "lsh_candidate_estimate",
    "sq8_reconstruction_error",
    "weighted_sample_es",
    "tokenizer_fertility",
    "boilerplate_prefix_clusters",
    "scorer_disagreement_scalable",
    "quality_calibration_scalable",
    "stream_drift_monitor_ks",
    "stream_incremental_cc",
    "value_histogram_equidepth_scalable",
    "stream_store_quantiles",
    "ks_two_sample_scalable",
    "selfjoin_size_estimate",
    "join_size_estimate_cms",
    "rfm_segmentation_scalable",
    # round-9 new queries (no prior correctness row)
    "doremi_domain_reweight",
    "kcenter_diverse_select",
    "stream_drift_monitor",
    "scorer_disagreement_select",
    "stream_incremental_simhash",
    "quality_calibration_scorers",
    "stream_incremental_cdc",
    "dsir_topk_scalable",
    "stream_incremental_winnow",
    "embedding_sq8_topk",
    "stream_incremental_cosine",
    "stream_topk_quality",
    # round-8 new queries (no prior correctness row)
    "stream_incremental_neardup",
    "stream_incremental_ivf",
    "stream_incremental_bm25",
    "stream_incremental_curation",
    "semantic_dedup_clusters",
    "dsir_importance_select",
    "dedup_token_savings",
    "quality_calibration_curve",
    # round-6 div micro-fix trio (VERDICT r6 item 2: changed code with no
    # r6 hard verdict — rotate first)
    "value_histogram",
    "distribution_drift_psi",
    "sequence_packing",
    # round-6 NEW queries (no prior correctness row)
    "bpe_merge_candidates",
    "stream_ingest_jdbc_e2e",
    "stream_ingest_e2e",
    "duplicated_spans",
    "document_chunking",
    "approx_quantile_check",
    "mad_outliers",
    # round-6 changed queries (adaptive LSH bits; approx_distinct bound-check
    # oracle; deletion-neighborhood fuzzy match; CC early-exit)
    "approx_distinct",
    "fuzzy_match_names",
    "embedding_ann_lsh",
    "embedding_cosine_neardup",
    "dedup_connected_components",
    "dedup_cluster_keep_best",
    # stalest block: last driver-verified in round 1/2
    "all_clusters_ok",
    "anti_join_idle_customers",
    "asof_join_latest_view",
    "batch_status_scan",
    "conditional_case",
    "cube_order_stats",
    "datetime_functions",
    "distinct_agg",
    "duplicate_delivery_counts",
    "event_validity_filter",
    "filter_project",
    "full_outer_nation_activity",
    "grouping_sets_mix",
    "hive_wildcard_prefix",
    "json_extract",
    "ledger_anti_join",
    "left_outer_order_distribution",
    "legacy_union_merge",
    "longest_prefix_route",
    "multimodal_frame_sample",
    "multimodal_metadata",
    "order_limit_topk",
    "pivot_status_counts",
    "prefix_projection",
    "pricing_summary",
    "range_join_price_band",
    "regex_filename_filter",
    "reprocess_omit_except",
    "revenue_by_nation",
    "rollup_revenue",
    "salted_skew_agg",
    "semi_join_active_customers",
    "set_intersect",
    "simhash_neardup_pairs",
    "small_quantity_revenue",
    "string_functions",
    "window_lag_lead",
    "window_running_sum",
    "window_topk_per_group",
    # round-5 block (verified r5, next-stalest after the above)
    "json_shape_roundtrip",
    "heavy_hitters_cms_only",
    "unigram_logprob_quality",
    "scd2_user_state",
    "domain_mix_report",
    "temperature_resample",
    "pii_redaction",
    "funnel_conversion",
    "ccnet_bucket",
    "line_dedup_fraction",
    "embedding_pq_topk",
    "value_outliers_zscore",
    "triangle_count_token_graph",
    "value_histogram",
    "weekly_retention",
    "ngram_novelty",
    "copurchase_pairs",
    "stream_funnel_join",
    "embedding_ivfpq_topk",
    "correlation_by_group",
    "linear_trend_by_group",
    "referential_integrity_audit",
    "readability_flesch",
    "chi_square_independence",
    "stream_dedup_within_watermark",
    "benford_digit_audit",
    "stream_static_enrich",
    "distribution_drift_psi",
    "lexical_entropy",
    "spend_gini_by_nation",
    "sequence_packing",
    "vocab_growth_curve",
    "sessionize_gaps_islands",
    "stream_tumbling_counts",
    "stream_dedup_dropduplicates",
    # round-3/4 block
    "kmeans_step",
    "embedding_cosine_neardup_exact",
    "gopher_quality_rules",
    "intra_doc_repetition",
    "tfidf_top_terms",
    "benchmark_contamination",
    "kmv_distinct_estimate",
    "exact_percentiles_by_priority",
    "heavy_hitters_cms",
    "bloom_filter_probe",
    "pagerank_token_graph",
    "multimodal_features",
    "embedding_ivf_topk",
    "array_functions",
    "stratified_sample",
    "merge_upsert",
    "unpivot_order_flags",
    "window_ranking_family",
    "having_filter",
    "salted_skew_join",
    "langid_heuristic",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "winnowing_fingerprints",
    "training_corpus_select",
    "embedding_topk_bruteforce",
    "embedding_centroid_by_label",
    "tumbling_window_events",
    "sliding_window_events",
    "session_window_events",
    "window_range_frame_spend",
    "resample_fill_gaps",
    "first_last_orders",
    # streaming forms with fixed per-query machinery cost sit last
    "stream_sliding_counts",
    "stream_session_counts",
    "stream_stateful_batcher",
]


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _last_green_rounds(root: str) -> dict[str, int]:
    """query name -> latest driver round with a green (rows+schema+hash)
    verdict, from the repo's CORRECTNESS_r*.json files."""
    import glob
    import json
    import os
    import re

    rounds: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        for q, v in data.items():
            if not isinstance(v, dict):
                continue
            green = (
                v.get("rows_match") and v.get("schema_match")
                and v.get("hash_match") is not False
            )
            if green:
                rounds[q] = max(rounds.get(q, 0), n)
    return rounds


def _verdict_commits(root: str) -> dict[int, str]:
    """round number -> the commit that recorded that round's verdict +
    correctness files (subject 'round N: verdict...'). That commit's tree is
    the newest code the round-N verdicts could describe, so it is the diff
    base for 'changed since round N'."""
    import re
    import subprocess

    out = subprocess.run(
        ["git", "-C", root, "log", "--format=%H %s"],
        capture_output=True, text=True, timeout=30,
    )
    if out.returncode != 0:
        return {}
    commits: dict[int, str] = {}
    for line in out.stdout.splitlines():
        m = re.match(r"([0-9a-f]{7,40}) round (\d+): verdict", line)
        if m:
            commits.setdefault(int(m.group(2)), m.group(1))
    return commits


def _diff_ranges(root: str, base: str) -> dict[str, list[tuple[int, int]]]:
    """repo-relative .py path -> new-side changed line ranges of
    `git diff base` (working tree included, so the derivation is correct
    both mid-build and after the driver's end-of-round commit)."""
    import re
    import subprocess

    out = subprocess.run(
        ["git", "-C", root, "diff", "--unified=0", "--no-color", base, "--",
         "*.py"],
        capture_output=True, text=True, timeout=60,
    )
    if out.returncode != 0:
        raise RuntimeError(f"git diff failed: {out.stderr[:200]}")
    ranges: dict[str, list[tuple[int, int, bool, tuple[str, ...]]]] = {}
    current = None
    removed: list[str] | None = None
    for line in out.stdout.splitlines():
        if line.startswith("+++ b/"):
            current = line[6:]
            removed = None
        elif line.startswith("@@") and current:
            m = re.match(r"@@ -\d+(?:,(\d+))? \+(\d+)(?:,(\d+))? @@", line)
            if m:
                old_count = int(m.group(1)) if m.group(1) is not None else 1
                start = int(m.group(2))
                count = int(m.group(3)) if m.group(3) is not None else 1
                # count == 0 is a pure deletion at this position: the
                # surrounding code changed, so keep a 1-line touch point.
                # old_count == 0 marks a PURE ADDITION — no existing line
                # modified or removed — which _derive_order can prove
                # harmless to existing queries when the added lines form
                # only complete new top-level definitions. The removed
                # lines ride along so deletions landing BETWEEN current
                # statements (whole-statement removals) can be attributed
                # to the names they deleted.
                removed = []
                ranges.setdefault(current, []).append(
                    (start, start + max(count, 1) - 1, old_count == 0, removed)  # type: ignore[arg-type]
                )
        elif removed is not None and line.startswith("-") and not line.startswith("---"):
            removed.append(line[1:])
    return {
        rel: [(a, b, p, tuple(rm)) for a, b, p, rm in rngs]
        for rel, rngs in ranges.items()
    }


def _query_spans() -> tuple[dict[str, list[tuple[int, int, str]]], dict[str, list[str]]]:
    """Current-source spans of every registered query (file -> [(start, end,
    name)]) plus file -> all query names in it. Spans include the @register
    decorator call, so oracle-SQL edits count as query changes."""
    import inspect
    import os

    root = _repo_root()
    spans: dict[str, list[tuple[int, int, str]]] = {}
    members: dict[str, list[str]] = {}
    for name, spec in QUERIES.items():
        try:
            f = inspect.getsourcefile(spec.fn)
            lines, start = inspect.getsourcelines(spec.fn)
        except (OSError, TypeError):
            continue
        rel = os.path.relpath(os.path.abspath(f), root)
        spans.setdefault(rel, []).append((start, start + len(lines) - 1, name))
        members.setdefault(rel, []).append(name)
    return spans, members


_TOPLEVEL_SPAN_CACHE: dict[tuple[str, str], list[tuple[int, int]]] = {}


def _toplevel_spans(root: str, rel: str) -> list[tuple[int, int]]:
    """Line spans of every top-level statement in the CURRENT file
    (decorators included), for the pure-addition harmlessness proof."""
    key = (root, rel)
    if key in _TOPLEVEL_SPAN_CACHE:
        return _TOPLEVEL_SPAN_CACHE[key]
    import ast
    import os

    with open(os.path.join(root, rel)) as fh:
        tree = ast.parse(fh.read())
    spans = []
    for node in tree.body:
        start = min(
            [node.lineno] + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        spans.append((start, node.end_lineno or start))
    _TOPLEVEL_SPAN_CACHE[key] = spans
    return spans


def _removed_toplevel_names(removed: tuple[str, ...]) -> tuple[set[str], bool]:
    """Names defined by removed column-0 lines (def/class/assignment
    heads), plus an `opaque` flag for removed code we cannot attribute
    (continuation lines are fine — their statement head names them; a
    col-0 code line with no extractable name is opaque)."""
    import re

    names: set[str] = set()
    opaque = False
    for ln in removed:
        if not ln or ln[0] in " \t" or ln.lstrip().startswith("#"):
            continue  # indented (body of a named stmt) / comment / blank
        m = re.match(r"(?:def|class)\s+(\w+)|(\w+)\s*[:=][^=]", ln)
        if m:
            names.add(m.group(1) or m.group(2))
        elif ln.startswith(("@", ")", "]", "}", '"', "'", "import ", "from ")):
            continue  # decorator/closer/docstring/import fragments
        else:
            opaque = True
    return names, opaque


def _is_new_toplevel_only(root: str, rel: str, a: int, b: int) -> bool:
    """True iff the purely-added hunk [a, b] (new-file coordinates) lies
    entirely inside top-level statements that are THEMSELVES fully inside
    the hunk — i.e. it adds only complete new module-level definitions
    (a new registered query, a new helper, a new constant). Such an
    addition cannot change any existing query's execution: no existing
    line was modified, and no pre-existing function body contains the
    new lines. An addition INSIDE an existing def (its span extends past
    the hunk) fails this test and keeps the conservative whole-module
    marking."""
    try:
        spans = _toplevel_spans(root, rel)
    except (OSError, SyntaxError):
        return False
    for s, e in spans:
        if a <= e and b >= s:  # hunk intersects this top-level statement
            if s < a or e > b:  # statement pre-exists beyond the hunk
                return False
    return True


_NAME_GRAPH_CACHE: dict[tuple[str, str], list[tuple[int, int, frozenset, frozenset, bool]]] = {}


def _name_graph(
    root: str, rel: str
) -> list[tuple[int, int, frozenset, frozenset, bool]]:
    """Per top-level statement of the CURRENT file: (start, end,
    names-it-defines, names-it-references, is-import). The reference set
    is an AST over-approximation (locals shadowing globals only ADD
    references), which is the safe direction for change tracking.
    Imports are marked so import-line churn (new names appended for new
    queries) does not flag whole modules: cross-module FUNCTION BODIES
    are outside this tracker's scope either way — the local oracle sweep
    is the backstop for those — so an import line carries no in-scope
    behavior signal."""
    key = (root, rel)
    if key in _NAME_GRAPH_CACHE:
        return _NAME_GRAPH_CACHE[key]
    import ast
    import os

    with open(os.path.join(root, rel)) as fh:
        tree = ast.parse(fh.read())
    out: list[tuple[int, int, frozenset, frozenset, bool]] = []
    for node in tree.body:
        start = min(
            [node.lineno] + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        end = node.end_lineno or start
        defined: set[str] = set()
        is_import = isinstance(node, (ast.Import, ast.ImportFrom))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            defined.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    defined.add(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            defined.add(node.target.id)
        elif is_import:
            for alias in node.names:
                defined.add(alias.asname or alias.name.split(".")[0])
        referenced = frozenset(
            n.id for n in ast.walk(node) if isinstance(n, ast.Name)
        )
        out.append((start, end, frozenset(defined), referenced, is_import))
    _NAME_GRAPH_CACHE[key] = out
    return out


def _reachable_names(
    graph: list[tuple[int, int, frozenset, frozenset]], qstart: int, qend: int
) -> set[str] | None:
    """Transitive closure of module-level names a query (span [qstart,
    qend]) can reach: seed with the references of the top-level
    statement(s) containing the span, then follow name -> defining
    statement -> its references. None => span not locatable (caller must
    fall back to conservative whole-module marking)."""
    seeds = [g for g in graph if g[0] <= qstart and qend <= g[1]]
    if not seeds:
        return None
    defs_by_name: dict[str, list[tuple[int, int, frozenset, frozenset]]] = {}
    for g in graph:
        for d in g[2]:
            defs_by_name.setdefault(d, []).append(g)
    seen: set[str] = set()
    frontier: set[str] = set().union(*[set(g[3]) for g in seeds])
    while frontier:
        n = frontier.pop()
        if n in seen:
            continue
        seen.add(n)
        for g in defs_by_name.get(n, []):
            frontier |= set(g[3]) - seen
    return seen


def _import_bindings_of(nodes) -> dict[str, tuple[str, str]]:
    """asname -> (source module, original name) over Import/ImportFrom
    nodes; Import binds the top package name to itself."""
    import ast

    out: dict[str, tuple[str, str]] = {}
    for node in nodes:
        if isinstance(node, ast.ImportFrom):
            mod = "." * node.level + (node.module or "")
            for alias in node.names:
                out[alias.asname or alias.name] = (mod, alias.name)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                out[alias.asname or alias.name.split(".")[0]] = (alias.name, "")
    return out


def _rebound_import_names(root: str, rel: str, removed: tuple[str, ...]) -> set[str]:
    """Names whose import binding CHANGED: bound by a removed import line
    and now either absent from the module's top-level imports or bound
    from a different source (``from .a import f`` -> ``from .b import
    f``). Such a rewire changes which object ``f`` is, so queries whose
    closure references ``f`` must re-verify even though the hunk's
    CURRENT statements are import-only. Pure append churn (``import a``
    -> ``import a, b`` rewriting the line) re-binds identically and is
    NOT flagged. Best-effort: parenthesized continuations are joined
    before parsing; fragments that still fail to parse yield no names
    (the local oracle sweep remains the backstop, as for all
    cross-module bodies)."""
    import ast
    import os
    import re

    text = "\n".join(removed)
    # Collapse parenthesized import lists onto one logical line.
    text = re.sub(r"\(([^()]*)\)", lambda m: m.group(1).replace("\n", " "), text)
    nodes = []
    for ln in text.splitlines():
        ln = ln.strip().rstrip(",\\")
        if not ln.startswith(("import ", "from ")):
            continue
        try:
            nodes.append(ast.parse(ln).body[0])
        except SyntaxError:
            continue
    old = _import_bindings_of(nodes)
    if not old:
        return set()
    try:
        with open(os.path.join(root, rel)) as fh:
            tree = ast.parse(fh.read())
    except (OSError, SyntaxError):
        return set(old)
    cur = _import_bindings_of(tree.body)
    return {name for name, src in old.items() if cur.get(name) != src}


def _changed_queries(root: str, last: dict[str, int]) -> set[str]:
    """Queries whose source changed since their own last green driver
    verdict — the tier-1 membership shared by `_derive_order` and the
    pre-registration report `window_status.py` (extracted so the margin
    report cannot drift from the order the driver actually uses)."""
    commits = _verdict_commits(root)
    spans, members = _query_spans()

    changed: set[str] = set()
    for rnd in sorted({r for r in last.values()}):
        base = commits.get(rnd)
        if base is None:
            # No verdict commit for this round (shouldn't happen): treat its
            # queries as changed so they re-verify rather than silently age.
            changed.update(q for q, r in last.items() if r == rnd)
            continue
        for rel, rngs in _diff_ranges(root, base).items():
            qspans = spans.get(rel)
            if not qspans:
                continue
            module_touched = False
            touched_names: set[str] = set()
            for a, b, pure_add, removed in rngs:
                hit = False
                for s, e, qname in qspans:
                    if a <= e and b >= s:
                        hit = True
                        if last.get(qname) == rnd:
                            changed.add(qname)
                if hit:
                    continue
                if pure_add and _is_new_toplevel_only(root, rel, a, b):
                    # Appending complete new top-level definitions cannot
                    # alter an existing query's execution (round-7 lesson:
                    # 31 appended registrations flooding tier 1 starved
                    # genuinely-changed queries out of the verification
                    # window).
                    continue
                # Module-level change outside every query span (a shared
                # helper body, a constant, an oracle CTE): attribute it to
                # the top-level names the hunk's statements define, and
                # flag only queries whose reference closure reaches one of
                # them. A hunk not attributable to any named statement
                # keeps the conservative whole-module marking.
                try:
                    graph = _name_graph(root, rel)
                except (OSError, SyntaxError):
                    module_touched = True
                    continue
                stmts = [g for g in graph if a <= g[1] and b >= g[0]]
                if stmts and all(g[4] for g in stmts):
                    # Import-only hunk: the CURRENT statements carry no
                    # in-scope behavior signal (see _name_graph docstring)
                    # — but a REMOVED import line may have rebound a name
                    # queries reference ('from .a import f' -> 'from .b
                    # import f'), so attribute those names before skipping.
                    touched_names |= _rebound_import_names(root, rel, removed)
                    continue
                hunk_names = set().union(
                    *[set(g[2]) for g in stmts if not g[4]], set()
                )
                if not stmts:
                    # Hunk lands BETWEEN current statements: a deleted
                    # whole top-level statement (or comment churn).
                    # Attribute the removed col-0 definitions by name;
                    # unparseable non-trivial removals stay conservative.
                    names, opaque = _removed_toplevel_names(removed)
                    hunk_names |= names
                    if opaque:
                        module_touched = True
                        continue
                    if not names:
                        continue  # comment/blank-only churn
                if hunk_names:
                    touched_names |= hunk_names
                else:
                    module_touched = True
            if module_touched:
                changed.update(q for q in members[rel] if last.get(q) == rnd)
            elif touched_names:
                graph = _name_graph(root, rel)
                for s, e, qname in qspans:
                    if last.get(qname) != rnd or qname in changed:
                        continue
                    reach = _reachable_names(graph, s, e)
                    if reach is None or reach & touched_names:
                        changed.add(qname)
    return changed


def _derive_order(reg_index: dict[str, int]) -> list[str]:
    """Mechanical verification-priority order: (1) queries with no green
    driver verdict yet, (2) queries whose source changed since their own
    last green round, (3) the rest, stalest round first; registration order
    breaks ties within each tier."""
    root = _repo_root()
    last = _last_green_rounds(root)
    if not last:
        raise RuntimeError("no CORRECTNESS files found")
    if not _verdict_commits(root):
        raise RuntimeError("no verdict commits found")
    changed = _changed_queries(root, last)

    def key(name: str) -> tuple[int, int, int]:
        if name not in last:
            tier = 0
        elif name in changed:
            tier = 1
        else:
            tier = 2
        return (tier, last.get(name, 0), reg_index[name])

    return sorted(QUERIES, key=key)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so registrations run, then return QUERIES
    in verification-priority order (see ``_FIRST``)."""
    # Imports are inside the function so `import plans.registry` stays cheap
    # and circular-import-free; modules register on import.
    from ..operators import (  # noqa: F401
        batching_sql,
        dedup,
        multimodal,
        relational,
        similarity,
        sketches,
        text,
        windows_sql,
    )
    from ..streaming import stream_queries  # noqa: F401

    _resolve_lazy_oracles()
    missing = set(_FIRST) - set(QUERIES)
    assert not missing, f"_FIRST names without a registered query: {sorted(missing)}"
    reg_index = {name: i for i, name in enumerate(QUERIES)}
    try:
        order = _derive_order(reg_index)
    except Exception:
        # No git / no correctness files (fresh checkout, sdist install):
        # fall back to the hand-checked static priority list. Warn loudly —
        # a silently-broken derivation would disable the verification
        # rotation without any signal (round-7 ADVICE).
        import logging
        import traceback

        logging.getLogger(__name__).warning(
            "registry._derive_order failed; falling back to the static "
            "_FIRST priority list (verification rotation DISABLED):\n%s",
            traceback.format_exc(),
        )
        order = list(_FIRST) + [n for n in QUERIES if n not in set(_FIRST)]
    return {name: QUERIES[name] for name in order}
