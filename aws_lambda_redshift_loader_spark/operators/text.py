"""Text-analysis operators for LLM training-data pipelines.

Beyond the reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, fingerprinting — all JVM-side regex/string
built-ins, no Python in the row path, so they run at full codegen speed on
100 TB.

Regex parity note: Spark uses Java regex, DuckDB uses RE2. Every pattern
here restricts to the common subset (char classes, alternation, \\b, \\S).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalar import codes_sql, hex_hash64, norm_text, rolling_hash_sql
from ..plans.registry import register
from ..session import defer_unpersist, table

# Stopword fingerprints per language (tiny n-gram-ish heuristic).
LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|a|in|is)\b",
    "es": r"\b(el|la|de|que|y|en)\b",
    "fr": r"\b(le|la|de|et|les|des)\b",
    "de": r"\b(der|die|und|das|ist|von)\b",
}


def _matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         length(regexp_extract_all(lower(text), '{LANG_PATTERNS["en"]}')) AS score_en,
         length(regexp_extract_all(lower(text), '{LANG_PATTERNS["es"]}')) AS score_es,
         length(regexp_extract_all(lower(text), '{LANG_PATTERNS["fr"]}')) AS score_fr,
         length(regexp_extract_all(lower(text), '{LANG_PATTERNS["de"]}')) AS score_de
  FROM documents
)
SELECT doc_id, labeled_lang,
       CAST(score_en AS BIGINT) AS score_en, CAST(score_es AS BIGINT) AS score_es,
       CAST(score_fr AS BIGINT) AS score_fr, CAST(score_de AS BIGINT) AS score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
            WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
            WHEN score_fr >= score_de THEN 'fr'
            ELSE 'de' END AS predicted_lang
FROM scored
"""


@register("langid_heuristic", _LANGID_ORACLE)
def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-hit scoring (n-gram heuristic family).

    Argmax is a fixed-priority CASE so ties resolve identically everywhere.
    Scale: pure regex projection — embarrassingly parallel, no shuffle.
    """
    d = table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            _matches(lowered, pat).cast("bigint").alias(f"score_{code}")
            for code, pat in LANG_PATTERNS.items()
        ],
    )
    en, es, fr, de = [F.col(f"score_{c}") for c in ("en", "es", "fr", "de")]
    return scored.withColumn(
        "predicted_lang",
        F.when((en >= es) & (en >= fr) & (en >= de), "en")
        .when((es >= fr) & (es >= de), "es")
        .when(fr >= de, "fr")
        .otherwise("de"),
    )


_QUALITY_ORACLE = r"""
WITH m AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS text_chars,
         CAST(greatest(length(regexp_extract_all(text, '\S+')), 1) AS BIGINT) AS n_words,
         CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
         CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is)\b')) AS BIGINT)
           AS n_stopwords,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nonspace
  FROM documents
)
SELECT doc_id, text_chars, n_words, n_punct, n_stopwords,
       CAST(n_punct AS DOUBLE) / text_chars AS punct_ratio,
       CAST(n_stopwords AS DOUBLE) / n_words AS stopword_ratio,
       CAST(n_nonspace AS DOUBLE) / n_words AS avg_word_len,
       (CAST(n_stopwords AS DOUBLE) / n_words) * 2.0
         - (CAST(n_punct AS DOUBLE) / text_chars) * 3.0
         + (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
         AS quality_score
FROM m
"""


@register("quality_score", _QUALITY_ORACLE)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length / punctuation / stopword-ratio
    features combined into one score (Gopher-rules-style heuristic).

    Double arithmetic is written in one fixed expression order on both
    sides so the results are bit-identical (single divisions and a 3-term
    sum — no reduction-order ambiguity)."""
    return _quality_of(table(spark, sf_dir, "documents"))


def _quality_of(d: DataFrame) -> DataFrame:
    """quality_score's map-only plan over any (doc_id, text) frame — the
    streaming curation form scores each micro-batch with the identical
    expressions (per-doc, so batch-local == corpus-global)."""
    m = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("text_chars"),
        F.greatest(F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)), F.lit(1))
        .cast("bigint")
        .alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit(r"[.,;:!?]"), 0)).cast("bigint").alias("n_punct"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\b(the|and|of|to|a|in|is)\b"), 0)
        )
        .cast("bigint")
        .alias("n_stopwords"),
        F.length(F.regexp_replace("text", r"\s", "")).cast("bigint").alias("n_nonspace"),
    )
    punct_ratio = F.col("n_punct").cast("double") / F.col("text_chars")
    stop_ratio = F.col("n_stopwords").cast("double") / F.col("n_words")
    return m.select(
        "doc_id",
        "text_chars",
        "n_words",
        "n_punct",
        "n_stopwords",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (F.col("n_nonspace").cast("double") / F.col("n_words")).alias("avg_word_len"),
        (
            stop_ratio * 2.0
            - punct_ratio * 3.0
            + F.when(F.col("n_words").between(20, 1000), 1.0).otherwise(0.0)
        ).alias("quality_score"),
    )


_TOKEN_ORACLE = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
         AS bpe_ish_tokens,
       CAST(length(text) AS DOUBLE) /
         greatest(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 1)
         AS chars_per_token
FROM documents
"""


@register("token_count", _TOKEN_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letters / digits / single punctuation) — the standard pre-tokenizer
    shape — and chars-per-token as a compressibility proxy."""
    bpe_pat = F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    d = table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", bpe_pat, 0))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).cast("bigint").alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_ish_tokens"),
        (F.length("text").cast("double") / F.greatest(bpe, F.lit(1))).alias("chars_per_token"),
    )


_FERTILITY_ORACLE = r"""
WITH m AS (
  SELECT lang,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws,
         CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
           AS bpe,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nbytes
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       CAST(SUM(nbytes) AS BIGINT) AS text_bytes,
       CAST(SUM(bpe) AS DOUBLE) / greatest(SUM(ws), 1) AS fertility,
       CAST(SUM(nbytes) AS DOUBLE) / greatest(SUM(bpe), 1) AS bytes_per_token
FROM m GROUP BY lang
"""


@register("tokenizer_fertility", _FERTILITY_ORACLE)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: BPE-ish subword tokens
    per whitespace word (fertility — the standard metric for how hard a
    tokenizer fragments a language) and UTF-8 bytes per subword token
    (compression rate) — the per-language statistics a multilingual
    training-mix design starts from. Counting reuses token_count's two
    segmentations; byte length is octet_length over the UTF-8 text, so
    multi-byte scripts (the zh slice of the fixture) genuinely diverge
    from their char counts.

    Determinism: all counters are exact integers summed per group;
    each output ratio is ONE double division of two exact sums
    (division is correctly rounded — no reduction-order ambiguity).

    Scale: map-only feature extraction + one 5-group aggregate with
    map-side partials; no join, no window — the same shape at 100 TB."""
    d = table(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("bigint")
    ws = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).cast("bigint")
    m = d.select(
        "lang",
        ws.alias("ws"),
        bpe.alias("bpe"),
        F.octet_length("text").cast("bigint").alias("nbytes"),
    )
    return m.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("nbytes").cast("bigint").alias("text_bytes"),
        (
            F.sum("bpe").cast("double") / F.greatest(F.sum("ws"), F.lit(1))
        ).alias("fertility"),
        (
            F.sum("nbytes").cast("double") / F.greatest(F.sum("bpe"), F.lit(1))
        ).alias("bytes_per_token"),
    )


_FINGERPRINT_ORACLE = r"""
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
       CAST(concat('0x', substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 15))
            AS BIGINT) AS fp_bucket
FROM documents
"""


@register("doc_fingerprint", _FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text, plus a 60-bit integer bucket (the cross-engine hex_hash64) usable
    as a shard/dedup key."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(norm_text("text"))
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint").alias("fp_bucket"),
    )


WINNOW_K = 8  # rolling k-gram length (chars)
WINNOW_W = 16  # winnowing window (hashes per window)


@register(
    "winnowing_fingerprints",
    f"""
    WITH codes AS (
      SELECT doc_id, {codes_sql()} AS cs
      FROM documents WHERE length(text) >= {WINNOW_K}
    ),
    hashed AS (
      SELECT doc_id, {rolling_hash_sql(WINNOW_K)} AS gh FROM codes
    ),
    grams AS (
      SELECT doc_id, u.i AS pos, gh[CAST(u.i AS INT)] AS gram_hash
      FROM hashed,
           LATERAL (SELECT unnest(generate_series(1, len(gh))) AS i) u
    ),
    windowed AS (
      SELECT doc_id,
             MIN(gram_hash) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW
                                  AND {WINNOW_W - 1} FOLLOWING) AS fp
      FROM grams
    )
    SELECT DISTINCT doc_id, fp AS fingerprint
    FROM windowed
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer/
    Wilkerson/Aiken's MOSS algorithm): hash every {WINNOW_K}-char gram,
    then keep the minimum hash of each {WINNOW_W}-gram window — the
    guarantee is any shared substring of length ≥ {WINNOW_K + WINNOW_W - 1}
    yields at least one shared fingerprint, so copied passages are
    detectable from a small sketch instead of full text comparison.

    Gram hashes are a Karp-Rabin polynomial (functions.scalar's shared
    rolling-hash machinery, base ROLL_B mod ROLL_P) over a ONCE-per-doc
    codepoint array:
    ~{WINNOW_K} integer multiply-adds per gram instead of an md5 block +
    hex + base conversion (the round-6 bench's heaviest constant — this
    swap measured 2.5-4x faster at sf0.1), with every step exact in
    int64 so the DuckDB oracle's list_reduce computes bit-identical
    hashes. The codepoint array also makes char access O(1); substring
    per char is an O(pos) UTF-8 scan that turns long docs quadratic.

    The rolling window is a frame-bounded MIN — one shuffle on doc_id,
    linear two-pointer evaluation per partition. The k-gram explode is
    bounded (one row per char); at 100 TB shard docs across partitions
    and the sketch per doc is ~len/w hashes, an ~94% reduction feeding
    any downstream pair-matching join.
    """
    return _winnow_fps(table(spark, sf_dir, "documents"))


def _winnow_fps(docs: DataFrame) -> DataFrame:
    """(doc_id, text) frame → winnowing fingerprints (doc_id,
    fingerprint). DataFrame-parameterized (same pattern as _band_rows /
    _cdc_chunk_rows): every step — rolling hash, window MIN, distinct —
    is within-doc, so the streaming incremental form fingerprints each
    micro-batch bit-identically to the batch plan."""
    # r18 (guide §4.2 + §2.4): the interpreted O(n·k) rolling-hash expr
    # (CodegenFallback, see _cdc_chunk_rows) AND the per-char explode →
    # doc_id-window MIN → global DISTINCT (two exchanges of one row per
    # character) collapse into ONE map-only mapInPandas: every step —
    # gram hashing, the sliding-window minimum (full windows via
    # stride tricks, the shortening tail windows via a suffix-min
    # scan), and the per-doc unique — is within-document, so the
    # emitted (doc_id, fingerprint) rows are already distinct and the
    # query plan carries ZERO exchanges where it had two. Hashes are
    # bit-identical (make_kr_gram_hasher, unit-pinned); the unchanged
    # window-SQL oracle is the equivalence gate.
    from ..functions.scalar import make_kr_gram_hasher

    d = docs.filter(F.length("text") >= WINNOW_K)
    base = d.select("doc_id", F.lower("text").alias("t"))
    gram_hashes = make_kr_gram_hasher(WINNOW_K)
    wsz = WINNOW_W

    def winnow_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            fps: list = []
            for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
                gh = gram_hashes(t)
                m = len(gh)
                if m == 0:
                    continue
                full = (
                    np.lib.stride_tricks.sliding_window_view(gh, wsz).min(axis=1)
                    if m >= wsz
                    else np.empty(0, dtype=np.int64)
                )
                # Tail positions have fewer than wsz following rows:
                # ROWS BETWEEN CURRENT AND wsz-1 FOLLOWING degrades to
                # min(gh[pos:]) — a reversed running minimum.
                tail = np.minimum.accumulate(gh[max(m - wsz + 1, 0) :][::-1])[
                    ::-1
                ]
                u = np.unique(np.concatenate((full, tail)))
                ids.extend([int(doc_id)] * len(u))
                fps.append(u)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "fingerprint": (
                        np.concatenate(fps)
                        if fps
                        else np.empty(0, dtype=np.int64)
                    ),
                }
            )

    return base.mapInPandas(
        winnow_batches, schema="doc_id bigint, fingerprint bigint"
    )


QUALITY_MIN = 0.5
TOKENS_MIN, TOKENS_MAX = 50, 5000


@register(
    "training_corpus_select",
    rf"""
    WITH canon AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
    ),
    features AS (
      SELECT d.doc_id, d.source,
             CAST(greatest(length(regexp_extract_all(d.text, '\S+')), 1) AS BIGINT) AS n_words,
             CAST(length(regexp_extract_all(d.text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
             (CAST(length(regexp_extract_all(lower(d.text),
                   '\b(the|and|of|to|a|in|is)\b')) AS DOUBLE) /
              greatest(length(regexp_extract_all(d.text, '\S+')), 1)) * 2.0
               - (CAST(length(regexp_extract_all(d.text, '[.,;:!?]')) AS DOUBLE)
                  / length(d.text)) * 3.0
               + (CASE WHEN greatest(length(regexp_extract_all(d.text, '\S+')), 1)
                       BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS quality_score,
             length(regexp_extract_all(lower(d.text), '{LANG_PATTERNS["en"]}')) AS s_en,
             length(regexp_extract_all(lower(d.text), '{LANG_PATTERNS["es"]}')) AS s_es,
             length(regexp_extract_all(lower(d.text), '{LANG_PATTERNS["fr"]}')) AS s_fr,
             length(regexp_extract_all(lower(d.text), '{LANG_PATTERNS["de"]}')) AS s_de
      FROM documents d JOIN canon c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, source, n_words, bpe_ish_tokens, quality_score
    FROM features
    WHERE s_en >= s_es AND s_en >= s_fr AND s_en >= s_de
      AND quality_score >= {QUALITY_MIN}
      AND bpe_ish_tokens BETWEEN {TOKENS_MIN} AND {TOKENS_MAX}
    """,
)
def training_corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite the engine exists for: materialize a training corpus
    slice — exact-dedup to canonical docs, keep English-detected text,
    quality score ≥ {QUALITY_MIN}, token count inside the budget window.
    One declarative plan composing the dedup/langid/quality/token
    operators, so Catalyst fuses all the per-doc feature extraction into
    a single scan projection and the only shuffle is the dedup groupBy.

    Scale: fingerprint groupBy is the lone shuffle; every filter is a
    scan-level predicate; at 100 TB this is a two-stage job regardless of
    corpus size.
    """
    d = table(spark, sf_dir, "documents")
    canon = (
        d.select("doc_id", F.md5(norm_text("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    lowered = F.lower(F.col("text"))
    n_words = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)), F.lit(1)
    ).cast("bigint")
    bpe = F.size(
        F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("bigint")
    stop_ratio = (
        F.size(
            F.regexp_extract_all(lowered, F.lit(r"\b(the|and|of|to|a|in|is)\b"), 0)
        ).cast("double")
        / n_words
    )
    punct_ratio = (
        F.size(F.regexp_extract_all("text", F.lit(r"[.,;:!?]"), 0)).cast("double")
        / F.length("text")
    )
    quality = (
        stop_ratio * 2.0
        - punct_ratio * 3.0
        + F.when(n_words.between(20, 1000), 1.0).otherwise(0.0)
    )
    scores = {c: _matches(lowered, p) for c, p in LANG_PATTERNS.items()}
    feats = d.join(canon, "doc_id").select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        bpe.alias("bpe_ish_tokens"),
        quality.alias("quality_score"),
        *[scores[c].alias(f"s_{c}") for c in ("en", "es", "fr", "de")],
    )
    en, es, fr, de = [F.col(f"s_{c}") for c in ("en", "es", "fr", "de")]
    return (
        feats.filter(
            (en >= es) & (en >= fr) & (en >= de)
            & (F.col("quality_score") >= QUALITY_MIN)
            & F.col("bpe_ish_tokens").between(TOKENS_MIN, TOKENS_MAX)
        )
        .select("doc_id", "source", "n_words", "bpe_ish_tokens", "quality_score")
    )


# Gopher-style repetition/quality gates (word-level: the synthetic corpus
# has no line structure, so the line rules' analogs operate on words).
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_AWL, GOPHER_MAX_AWL = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORD_HITS = 2

_GOPHER_ORACLE = rf"""
WITH m AS (
  SELECT doc_id,
         CAST(greatest(length(regexp_extract_all(text, '\S+')), 1) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nonspace,
         CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_symbols,
         CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is)\b')) AS BIGINT)
           AS n_stopwords
  FROM documents
)
SELECT doc_id, n_words,
       CAST(n_nonspace AS DOUBLE) / n_words AS avg_word_len,
       CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
       n_stopwords,
       n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS ok_word_count,
       CAST(n_nonspace AS DOUBLE) / n_words BETWEEN {GOPHER_MIN_AWL} AND {GOPHER_MAX_AWL}
         AS ok_word_len,
       CAST(n_symbols AS DOUBLE) / n_words <= {GOPHER_MAX_SYMBOL_RATIO} AS ok_symbols,
       n_stopwords >= {GOPHER_MIN_STOPWORD_HITS} AS ok_stopwords,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
         AND (CAST(n_nonspace AS DOUBLE) / n_words
              BETWEEN {GOPHER_MIN_AWL} AND {GOPHER_MAX_AWL})
         AND (CAST(n_symbols AS DOUBLE) / n_words <= {GOPHER_MAX_SYMBOL_RATIO})
         AND (n_stopwords >= {GOPHER_MIN_STOPWORD_HITS}) AS passes_all
FROM m
"""


@register("gopher_quality_rules", _GOPHER_ORACLE)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules-style hard quality gates (Rae et al. 2021 §A1.1,
    adapted to word level): word-count window, mean-word-length window,
    symbol-to-word ratio cap, minimum stopword evidence — each emitted
    as its own boolean plus the conjunction, so a pipeline can both
    filter on `passes_all` and audit which rule fired per document.

    Scale: pure scan projection (regex counts + a few divides), no
    shuffle, full codegen."""
    d = table(spark, sf_dir, "documents")
    n_words = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)), F.lit(1)
    ).cast("bigint")
    n_nonspace = F.length(F.regexp_replace("text", r"\s", "")).cast("bigint")
    n_symbols = F.size(
        F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0)
    ).cast("bigint")
    n_stop = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(r"\b(the|and|of|to|a|in|is)\b"), 0)
    ).cast("bigint")
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_nonspace.alias("n_nonspace"),
        n_symbols.alias("n_symbols"),
        n_stop.alias("n_stopwords"),
    )
    awl = F.col("n_nonspace").cast("double") / F.col("n_words")
    sym = F.col("n_symbols").cast("double") / F.col("n_words")
    ok_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_awl = awl.between(GOPHER_MIN_AWL, GOPHER_MAX_AWL)
    ok_sym = sym <= GOPHER_MAX_SYMBOL_RATIO
    ok_stop = F.col("n_stopwords") >= GOPHER_MIN_STOPWORD_HITS
    return m.select(
        "doc_id",
        "n_words",
        awl.alias("avg_word_len"),
        sym.alias("symbol_ratio"),
        "n_stopwords",
        ok_wc.alias("ok_word_count"),
        ok_awl.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_awl & ok_sym & ok_stop).alias("passes_all"),
    )


_REPETITION_ORACLE = r"""
WITH words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         CAST(greatest(len(ws) - 1, 1) AS BIGINT) AS n_grams,
         CAST(len(ws) AS BIGINT) AS n_words,
         u.g AS gram
  FROM words,
       LATERAL (SELECT unnest([ws[i] || ' ' || ws[i + 1]
                               FOR i IN range(1, greatest(len(ws), 2))]) AS g) u
)
SELECT doc_id,
       MAX(n_words) AS n_words,
       MAX(n_grams) AS n_grams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_grams,
       1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / MAX(n_grams) AS dup_gram_fraction
FROM grams
GROUP BY doc_id
"""


@register("intra_doc_repetition", _REPETITION_ORACLE)
def intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the Gopher duplicate-n-gram-fraction
    family): fraction of word 2-grams that are repeats of an earlier
    2-gram in the same document — high values flag boilerplate/looping
    text that exact and near dedup both miss (they compare ACROSS
    documents).

    Scale: explode is bounded (one row per word), the groupBy(doc_id)
    carries a COUNT DISTINCT — one shuffle, partial aggregation
    map-side."""
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split(norm_text("text"), " ").alias("ws"))
    grams = words.select(
        "doc_id",
        F.greatest(F.size("ws") - 1, F.lit(1)).cast("bigint").alias("n_grams"),
        F.size("ws").cast("bigint").alias("n_words"),
        F.explode(
            F.expr("transform(sequence(1, greatest(size(ws) - 1, 1)), "
                   "i -> concat(ws[i - 1], ' ', ws[i]))")
        ).alias("gram"),
    )
    return grams.groupBy("doc_id").agg(
        F.max("n_words").alias("n_words"),
        F.max("n_grams").alias("n_grams"),
        F.countDistinct("gram").cast("bigint").alias("distinct_grams"),
        (
            F.lit(1.0)
            - F.countDistinct("gram").cast("double") / F.max("n_grams")
        ).alias("dup_gram_fraction"),
    )


TFIDF_TOP_K = 3

_TFIDF_ORACLE = rf"""
WITH tokens AS (
  SELECT doc_id, u.token
  FROM (SELECT doc_id,
               string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
       LATERAL (SELECT unnest(ws) AS token) u
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tokens GROUP BY doc_id, token
),
df AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tokens GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token AS term, tf.tf, df.df,
         CAST(floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000000)
              AS BIGINT) AS tfidf_q
  FROM tf JOIN df ON df.token = tf.token CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf_q, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_q DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOP_K}
"""


@register("tfidf_top_terms", _TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-{TFIDF_TOP_K} terms by tf·idf — the classic
    keyword/topic primitive over an inverted index (term frequency per
    doc × ln(N/document-frequency)).

    Determinism: natural log is NOT correctly-rounded-guaranteed (Java's
    Math.log and libm disagree by 1 ulp on this very fixture), so the
    score is quantized to floor(tf·ln(N/df)·10⁶) int64 — the ulp noise
    sits ~6 orders of magnitude below the quantum, and ranking on the
    quantized integer makes the top-k identical everywhere; ties order
    by term. Scale: two shuffles (tf groupBy, df groupBy) + a
    token-keyed hash join against the df side; the final top-k is a
    WindowGroupLimit — rank-1..k filtering happens map-side before the
    window shuffle."""
    d = table(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(F.split(norm_text("text"), " ")).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count("*").cast("bigint").alias("tf"))
    df = tokens.groupBy("token").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    n_docs = d.count()  # one scalar job; the corpus count is plan metadata
    scored = (
        tf.join(df, "token")
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "tf",
            "df",
            F.floor(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) * 1_000_000
            )
            .cast("bigint")
            .alias("tfidf_q"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf_q").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "tfidf_q", "rank")
    )


PR_ITERS = 3  # fixed PageRank rounds (unrolled in the oracle)
PR_SCALE = 1_000_000  # integer rank scale
# Integer damping: teleport = (SCALE*15) div 100, propagate 85%.
_PR_BASE = (PR_SCALE * 15) // 100

_PR_GRAPH_CTE = r"""
words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
  FROM documents
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM (
    SELECT ws[i] AS src, ws[i + 1] AS dst
    FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 1, 1))) AS i)
    WHERE len(ws) >= 2
  ) GROUP BY src, dst
),
outdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
)
"""


def _pagerank_oracle(iters: int) -> str:
    parts = [f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)"]
    for t in range(iters):
        parts.append(
            f"""r{t + 1} AS (
      SELECT n.node,
             {_PR_BASE} + (85 * coalesce(s.contrib, 0)) // 100 AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM((p.r * e.w) // o.wout) AS BIGINT) AS contrib
        FROM edges e
        JOIN r{t} p ON p.node = e.src
        JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )"""
        )
    chained = ",\n    ".join(parts)
    return f"""
    WITH {_PR_GRAPH_CTE},
    {chained}
    SELECT node AS token, CAST(r AS BIGINT) AS rank_q FROM r{iters}
    """


@register("pagerank_token_graph", _pagerank_oracle(PR_ITERS))
def pagerank_token_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the directed token-bigram graph (word → next word,
    weighted by corpus bigram counts) — {PR_ITERS} fixed rounds, the
    second iterative-algorithm family next to connected components.
    Token authority on the co-occurrence graph surfaces hub/function
    words (a TextRank-style centrality usable for stopword discovery).

    Cross-engine determinism by INTEGER arithmetic end to end: ranks are
    {PR_SCALE}-scaled int64; per-edge contribution is (r·w) div w_out,
    damping is (85·sum) div 100 + a constant integer teleport — all
    positive integer division (floor == truncate), so no float ever
    appears and the unrolled-CTE oracle matches bit-for-bit. (Dangling
    mass is not redistributed — the uniform-teleport variant — noted so
    the parity claim is exact.)

    Scale: per round one join edges⋈ranks (shuffle on src) + one grouped
    sum (shuffle on dst) — the Pregel shape; state is one int per node.
    Rank skew (celebrity nodes) is absorbed by the map-side combine on
    dst."""
    d = table(spark, sf_dir, "documents")
    words = d.select(F.split(norm_text("text"), " ").alias("ws")).filter(F.size("ws") >= 2)
    edges = (
        words.select(
            F.explode(
                F.expr("transform(sequence(1, greatest(size(ws) - 1, 1)), "
                       "i -> struct(ws[i - 1] AS src, ws[i] AS dst))")
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    outdeg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("wout"))
    # r18 (the PPR/LPA loop pattern, guide §5): materialize the
    # loop-invariant edge and node frames once — un-checkpointed, every
    # one of the {PR_ITERS} unrolled rounds re-ran the tokenize + edge
    # aggregate (14 distinct parquet scans, zero ReusedExchange in the
    # final plan).
    edges = edges.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("r"))
    for _ in range(PR_ITERS):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", F.expr("(r * w) div wout").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("contrib"))
        )
        ranks = nodes.join(
            contribs, nodes.node == contribs.dst, "left"
        ).select(
            "node",
            (
                F.lit(_PR_BASE)
                + F.expr("85 * coalesce(contrib, 0) div 100")
            ).cast("bigint").alias("r"),
        )
    return ranks.select(F.col("node").alias("token"), F.col("r").alias("rank_q"))


# CCNet-style LM-quality proxy (Wenzek et al. 2020): score each document
# by the mean unigram surprisal -ln p(token) under the corpus's own
# unigram distribution. Low mean surprisal ≈ boilerplate/repetitive text;
# high ≈ rare-token noise — the standard first-pass perplexity filter
# before a real LM scores the corpus. ln() is NOT correctly rounded
# across engines (Java Math.log vs libm differ by 1 ulp), so every
# logarithm is quantized to floor(ln(x)*1e6) BIGINT on BOTH sides and all
# downstream arithmetic is integer-exact.
_SURPRISAL_CTES = r"""toks AS (
  SELECT doc_id, u.token
  FROM (SELECT doc_id,
               string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents),
       LATERAL (SELECT unnest(ws) AS token) u
),
vocab AS (
  SELECT token, CAST(floor(ln(COUNT(*)) * 1e6) AS BIGINT) AS q_ln_cnt
  FROM toks GROUP BY token
),
tot AS (
  SELECT CAST(floor(ln(COUNT(*)) * 1e6) AS BIGINT) AS q_ln_total FROM toks
),
per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(v.q_ln_cnt) AS sum_q
  FROM toks t JOIN vocab v ON v.token = t.token
  GROUP BY t.doc_id
)"""

_SURPRISAL_ORACLE = f"""
WITH {_SURPRISAL_CTES}
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens * q_ln_total - sum_q AS BIGINT) AS surprisal_q,
       CAST(n_tokens * q_ln_total - sum_q AS DOUBLE) / n_tokens AS mean_surprisal_q
FROM per_doc, tot
"""


# Per-session materializations of the two corpus-wide scorer frames
# (one row per document each). Nine queries consume the surprisal frame
# and three the NB-linear frame; without the memo every one re-pays the
# token-keyed vocab shuffle. Same contract as dedup's pair-graph memo:
# localCheckpoint-backed (survives bench.py's clearCache), keyed on
# (applicationId, sf_dir), build/hit labeled in dedup.MEMO_EVENTS so
# bench rows stay interpretable, and CLEARED by the scale instruments
# so exponents measure full costs.
_SURP_MEMO: dict[tuple[str, str], DataFrame] = {}
_NB_MEMO: dict[tuple[str, str], DataFrame] = {}


def _scorer_memo(
    spark: SparkSession, sf_dir: str, memo: dict, label: str, build
) -> DataFrame:
    from ..operators.dedup import MEMO_EVENTS

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = memo.get(key)
    if cached is not None:
        MEMO_EVENTS.append(f"{label}_hit")
        return cached
    MEMO_EVENTS.append(f"{label}_build")
    out = build().localCheckpoint(eager=True)
    memo[key] = out
    return out


def _doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (doc_id, n_tokens, surprisal_q, mean_surprisal_q) — the
    unigram-surprisal scorer frame, memoized per session (see
    _SURP_MEMO)."""
    return _scorer_memo(
        spark, sf_dir, _SURP_MEMO, "surprisal", lambda: _doc_surprisal_plan(spark, sf_dir)
    )


def _doc_surprisal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-memoized surprisal plan (the scale instruments and any
    caller wanting a fresh lineage use this)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(norm_text("text"), " ")).alias("token"))
    vocab = toks.groupBy("token").agg(
        F.floor(F.ln(F.count("*")) * 1e6).cast("bigint").alias("q_ln_cnt")
    )
    total = toks.agg(
        F.floor(F.ln(F.count("*")) * 1e6).cast("bigint").alias("q_ln_total")
    )
    per_doc = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("q_ln_cnt").alias("sum_q"))
    )
    surprisal = F.col("n_tokens") * F.col("q_ln_total") - F.col("sum_q")
    return per_doc.crossJoin(total).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        surprisal.cast("bigint").alias("surprisal_q"),
        (surprisal.cast("double") / F.col("n_tokens")).alias("mean_surprisal_q"),
    )


@register("unigram_logprob_quality", _SURPRISAL_ORACLE)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram surprisal per document (micro-nats): -ln p(tok) =
    ln(N_total) - ln(cnt_tok) summed over occurrences, all logs quantized
    to int64 micro-nats so the oracle matches bit-for-bit.

    Scale: vocab is a token-keyed groupBy with map-side combine; the
    tokens⋈vocab join shuffles on token with NO broadcast hint (vocab
    cardinality is unbounded — AQE decides); the corpus total is a 1-row
    aggregate, the one genuinely broadcast-safe shape. Per-doc reduce is
    a second map-side-combined groupBy. Nothing Python, nothing driver."""
    return _doc_surprisal(spark, sf_dir)


_CCNET_SAMPLE_MOD = 10  # ~10% threshold-calibration sample


@register(
    "ccnet_bucket",
    f"""
    WITH {_SURPRISAL_CTES},
    scored AS (
      SELECT doc_id,
             CAST(n_tokens * q_ln_total - sum_q AS DOUBLE) / n_tokens AS mean_surprisal_q
      FROM per_doc, tot
    ),
    sample AS (
      SELECT mean_surprisal_q, doc_id FROM scored
      WHERE CAST(concat('0x', substr(md5(concat('ppl:', CAST(doc_id AS VARCHAR))), 1, 15))
                 AS BIGINT) % {_CCNET_SAMPLE_MOD} = 0
    ),
    ranked AS (
      SELECT mean_surprisal_q,
             row_number() OVER (ORDER BY mean_surprisal_q ASC, doc_id ASC) AS rn,
             COUNT(*) OVER () AS n
      FROM sample
    ),
    thr AS (
      SELECT MAX(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT)
                      THEN mean_surprisal_q END) AS t1,
             MAX(CASE WHEN rn = CAST(ceil(2 * n / 3.0) AS BIGINT)
                      THEN mean_surprisal_q END) AS t2
      FROM ranked
    )
    SELECT doc_id, mean_surprisal_q,
           CASE WHEN mean_surprisal_q <= t1 THEN 'head'
                WHEN mean_surprisal_q <= t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored, thr
    """,
)
def ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partitioning (Wenzek et al. 2020): tertile
    thresholds of mean unigram surprisal are calibrated on a ~{100 // _CCNET_SAMPLE_MOD}%
    deterministic md5-gated sample, then the FULL corpus is bucketed
    map-only against the two broadcast cutoffs — low surprisal = 'head'
    (fluent/common), high = 'tail' (rare-token noise).

    Scale: this is the honest 100 TB shape for global quantile gating —
    the global sort happens only on the bounded calibration sample (one
    window task over ~N/{_CCNET_SAMPLE_MOD} rows at sample grain; at real
    scale the gate modulus grows so the sample stays fixed-size), while
    the corpus-wide pass is a cross join against a 1-row threshold
    aggregate. Never rank 100 TB to bucket it."""
    from pyspark.sql.window import Window as W

    scored = _doc_surprisal(spark, sf_dir).select("doc_id", "mean_surprisal_q")
    sample = scored.filter(
        hex_hash64(F.col("doc_id").cast("string"), salt="ppl:") % _CCNET_SAMPLE_MOD == 0
    )
    rank_w = W.orderBy(F.col("mean_surprisal_q").asc(), F.col("doc_id").asc())
    ranked = sample.select(
        "mean_surprisal_q",
        F.row_number().over(rank_w).alias("rn"),
        F.count("*").over(W.partitionBy()).alias("n"),
    )
    thr = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") / 3.0), F.col("mean_surprisal_q")
            )
        ).alias("t1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 2 / 3.0), F.col("mean_surprisal_q")
            )
        ).alias("t2"),
    )
    return scored.crossJoin(thr).select(
        "doc_id",
        "mean_surprisal_q",
        F.when(F.col("mean_surprisal_q") <= F.col("t1"), "head")
        .when(F.col("mean_surprisal_q") <= F.col("t2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@register(
    "domain_mix_report",
    r"""
    WITH toks AS (
      SELECT doc_id, source, lang,
             len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
               AS n_tokens,
             n_chars
      FROM documents
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens
    FROM toks
    GROUP BY source, lang
    """,
)
def domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by (source, lang): doc/token/char totals and
    mean length — the mixture report every training-data pipeline keeps
    in front of its sampling weights (what fraction of the corpus is
    which domain, in which language, at what verbosity).

    Scale: token counts are size(split()) projections (no explode — the
    per-doc count never materializes token rows), then one
    map-side-combined groupBy on a low-cardinality key."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", "lang", "n_chars",
        F.size(F.split(norm_text("text"), " ")).alias("n_tokens"),
    )
    return toks.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("mean_tokens"),
    )


# Temperature-resampling gate scale: rates are floor-quantized to parts
# per RESAMPLE_SCALE so the hash gate is integer-exact in both engines.
RESAMPLE_SCALE = 1_000_000
RESAMPLE_TARGET_PER_SOURCE = 2.0  # K: kept docs per source ~ K*sqrt(n_s)


@register(
    "temperature_resample",
    f"""
    WITH sized AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    rated AS (
      -- keep-rate r_s = min(1, K/sqrt(n_s)): sampling proportional to
      -- n^0.5 (temperature alpha=0.5). sqrt and divide are correctly
      -- rounded IEEE ops, so the quantized rate matches across engines.
      SELECT source, n_docs,
             CAST(floor(least(1.0, {RESAMPLE_TARGET_PER_SOURCE} / sqrt(n_docs))
                        * {RESAMPLE_SCALE}) AS BIGINT) AS rate_q
      FROM sized
    )
    SELECT d.doc_id, d.source, r.rate_q
    FROM documents d JOIN rated r ON r.source = d.source
    WHERE CAST(concat('0x', substr(md5(concat('resample:', CAST(d.doc_id AS VARCHAR))), 1, 15))
               AS BIGINT) % {RESAMPLE_SCALE} < r.rate_q
    """,
)
def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual/domain
    rebalancing of Conneau & Lample 2019 at alpha=0.5): per-source keep
    rate K/sqrt(n_s) flattens the domain distribution toward the small
    sources; membership is a deterministic md5 gate on doc_id, so the
    sample is reproducible and lineage-stable (same property as
    stratified_sample, different target distribution).

    Scale: per-source counts are a tiny aggregate; the gate is a map-only
    predicate after a small-side join AQE will broadcast at runtime (the
    source dimension is bounded by construction, unlike per-doc tables —
    no manual hint either way)."""
    d = table(spark, sf_dir, "documents")
    sized = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs"))
    rated = sized.select(
        "source", "n_docs",
        F.floor(
            F.least(F.lit(1.0), F.lit(RESAMPLE_TARGET_PER_SOURCE) / F.sqrt("n_docs"))
            * RESAMPLE_SCALE
        ).cast("bigint").alias("rate_q"),
    )
    gate = hex_hash64(F.col("doc_id").cast("string"), salt="resample:") % RESAMPLE_SCALE
    return (
        d.join(rated, "source")
        .filter(gate < F.col("rate_q"))
        .select("doc_id", "source", "rate_q")
    )


# Publicly-standard PII patterns (emails / E.164-ish phones), restricted
# to the Java-regex ∩ RE2 subset (no backrefs, no lookaround).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"


@register(
    "pii_redaction",
    f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
           md5(regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                              '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count + redact email/phone spans with
    placeholder tokens (the standard pre-training privacy filter). The
    redacted text is emitted as an md5 so the oracle verifies the exact
    output string without hauling full texts through the compare.

    Scale: two regexp_replace projections, JVM codegen, map-only —
    embarrassingly parallel at any corpus size."""
    d = table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).cast("bigint").alias("n_emails"),
        F.md5(redacted).alias("redacted_md5"),
    )


def _token_graph_triangles(spark: SparkSession, sf_dir: str):
    """(degree frame, per-node triangle counts) over the undirected
    token co-occurrence graph — the degree-ordered enumeration shared
    by triangle_count_token_graph (top-K report) and
    clustering_coefficient_nodes (per-node ratio)."""
    d = table(spark, sf_dir, "documents")
    words = d.select(F.split(norm_text("text"), " ").alias("ws")).filter(F.size("ws") >= 2)
    bigrams = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 1, 1)), "
                "i -> struct(ws[i - 1] AS src, ws[i] AS dst))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    und = (
        bigrams.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    with_deg = und.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    triangles = (
        e1.join(e2, F.col("e2.lo") == F.col("e1.hi"))
        .join(e3, (F.col("e3.lo") == F.col("e1.lo")) & (F.col("e3.hi") == F.col("e2.hi")))
        .select(F.col("e1.lo").alias("x"), F.col("e1.hi").alias("y"), F.col("e2.hi").alias("z"))
    )
    per_node = (
        triangles.select(F.col("x").alias("node"))
        .unionByName(triangles.select(F.col("y").alias("node")))
        .unionByName(triangles.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return deg, per_node


TRIANGLE_TOP = 25  # report the 25 most triangle-dense tokens


@register(
    "triangle_count_token_graph",
    f"""
    WITH {_PR_GRAPH_CTE},
    undirected AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM undirected UNION ALL SELECT b FROM undirected
      ) GROUP BY node
    ),
    oriented AS (
      -- orient each edge from the LOWER-(degree, name) endpoint to the
      -- higher: out-degree of any node is bounded by its higher-ordered
      -- neighborhood, which tames power-law hubs.
      SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS lo,
             CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS hi
      FROM undirected u
      JOIN deg da ON da.node = u.a
      JOIN deg db ON db.node = u.b
    ),
    triangles AS (
      -- wedge at the lowest-ordered vertex + closing edge: each triangle
      -- counted exactly once.
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM oriented e1
      JOIN oriented e2 ON e2.lo = e1.hi
      JOIN oriented e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (
        SELECT x AS node FROM triangles
        UNION ALL SELECT y FROM triangles
        UNION ALL SELECT z FROM triangles
      ) GROUP BY node
    )
    SELECT node AS token, n_triangles, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY n_triangles DESC, node ASC) AS rank
      FROM per_node
    ) WHERE rank <= {TRIANGLE_TOP}
    """,
)
def triangle_count_token_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the undirected token co-occurrence graph —
    the graph-analytics family next to the iterative ones (PageRank,
    connected components): triangles are ENUMERATED by the canonical
    two-join plan, not converged. Per-token triangle membership is the
    local clustering signal (function words close many triangles;
    content words few) — top-{TRIANGLE_TOP} reported.

    This is the real degree-ordered algorithm (Latapy 2008 / the
    standard distributed formulation): every edge is oriented from its
    lower-(degree, name) endpoint to the higher one, so wedges are only
    built at each triangle's LOWEST-ordered vertex. A celebrity hub
    contributes wedges only through its (few) higher-ordered neighbors —
    per-node wedge work is O(out-degree²) with out-degree bounded by
    sqrt(edges) under this orientation, instead of O(hub-degree²). A
    lexicographic a<b orientation would NOT give that bound (a
    lexicographically-small hub keeps its whole neighborhood); the
    orientation costs one degree aggregate + join, both map-side
    combined. Per-node triangle counts are orientation-independent, so
    the oracle mirrors the same (degree, name) order and enumerates the
    identical set.

    Scale: degree aggregate, two shuffle joins on edge endpoints, one
    union-groupBy — all map-side combined; no iteration, no driver
    state."""
    _deg, per_node = _token_graph_triangles(spark, sf_dir)
    from pyspark.sql.window import Window as W

    w = W.orderBy(F.col("n_triangles").desc(), F.col("node").asc())
    return (
        per_node.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TRIANGLE_TOP)
        .select(F.col("node").alias("token"), "n_triangles", "rank")
    )


_READABILITY_ORACLE = r"""
WITH m AS (
  SELECT doc_id,
         CAST(greatest(length(regexp_extract_all(text, '\S+')), 1) AS BIGINT) AS n_words,
         CAST(greatest(length(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
         CAST(greatest(length(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
               - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) AS flesch
FROM m
"""


@register("readability_flesch", _READABILITY_ORACLE)
def readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948 — the classic
    readability feature in quality-filter stacks): words, sentence-ish
    [.!?]+ runs, and vowel-group syllable approximation, combined in the
    standard formula. The three counts are integers and the formula is a
    fixed IEEE chain, so scores match bit-for-bit cross-engine.

    Scale: three regexp projections + arithmetic — map-only codegen."""
    d = table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.greatest(F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)), F.lit(1))
        .cast("bigint").alias("n_words"),
        F.greatest(F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)), F.lit(1))
        .cast("bigint").alias("n_sentences"),
        F.greatest(
            F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"[aeiouy]+"), 0)), F.lit(1)
        ).cast("bigint").alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    return m.select("doc_id", "n_words", "n_sentences", "n_syllables", flesch.alias("flesch"))


@register(
    "lexical_entropy",
    r"""
    WITH toks AS (
      SELECT doc_id, u.token
      FROM (SELECT doc_id,
                   string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY doc_id, token
    ),
    sized AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n FROM tf GROUP BY doc_id
    ),
    terms AS (
      -- per-term -p*ln(p) quantized to micro-nats BEFORE the doc sum
      SELECT t.doc_id,
             CAST(floor((-(CAST(t.cnt AS DOUBLE) / s.n)
                         * ln(CAST(t.cnt AS DOUBLE) / s.n)) * 1e6) AS BIGINT) AS h_q
      FROM tf t JOIN sized s ON s.doc_id = t.doc_id
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
           CAST(SUM(h_q) AS BIGINT) AS entropy_q
    FROM terms GROUP BY doc_id
    """,
)
def lexical_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's own token distribution
    (micro-nats) — the lexical-diversity feature complementing surprisal
    (which scores against the CORPUS distribution): low entropy flags
    keyword-stuffed or template text even when its vocabulary is common.
    Per-term −p·ln p quantizes to int64 before the per-doc sum, so the
    score is reduction-order-independent despite ln.

    Scale: two map-side-combined groupBys (doc×token, then doc) and a
    doc-keyed join — no corpus-wide state at all."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(norm_text("text"), " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").cast("bigint").alias("cnt"))
    sized = tf.groupBy("doc_id").agg(F.sum("cnt").cast("bigint").alias("n"))
    p = F.col("cnt").cast("double") / F.col("n")
    h_q = F.floor((-p * F.log(p)) * 1e6).cast("bigint")
    return (
        tf.join(sized, "doc_id")
        .select("doc_id", h_q.alias("h_q"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_tokens"),
            F.sum("h_q").cast("bigint").alias("entropy_q"),
        )
    )


PACK_SHARDS = 8  # parallel packing shards (hash-assigned)
PACK_SEQ_LEN = 512  # tokens per training sequence


@register(
    "sequence_packing",
    rf"""
    WITH sized AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(concat('pack:', CAST(doc_id AS VARCHAR))), 1, 15))
                  AS BIGINT) % {PACK_SHARDS} AS shard,
             CAST(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    offsets AS (
      SELECT doc_id, shard, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS start_tok
      FROM sized
    )
    SELECT doc_id, shard, n_tokens,
           CAST(start_tok // {PACK_SEQ_LEN} AS BIGINT) AS start_seq,
           CAST((start_tok + n_tokens - 1) // {PACK_SEQ_LEN}
                - start_tok // {PACK_SEQ_LEN} + 1 AS BIGINT) AS n_spans
    FROM offsets
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing plan (the GPT-style concatenate-and-cut
    final stage of a data pipeline): documents hash-assign to
    {PACK_SHARDS} parallel shards, concatenate in doc_id order within
    each shard, and the {PACK_SEQ_LEN}-token grid cuts the stream — each
    document learns which sequence it starts in and how many sequences
    it spans (spans > 1 = crosses a boundary; the attention-mask /
    document-boundary bookkeeping the training loader needs).

    Deterministic: the shard gate is the cross-engine md5 hash, offsets
    are an exclusive running sum over (shard, doc_id) — integers end to
    end.

    Scale: THE point of sharding — packing is inherently sequential, so
    make it sequential per shard, parallel across shards (at 100 TB,
    thousands of shards = thousands of independent cumsum partitions;
    one window shuffle, no global order anywhere)."""
    from ..functions.scalar import hex_hash64

    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        (hex_hash64(F.col("doc_id").cast("string"), salt="pack:") % PACK_SHARDS).alias("shard"),
        F.size(F.split(norm_text("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = sized.select(
        "doc_id", "shard", "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint").alias("start_tok"),
    )
    # integer `div`, not double `/` + floor: token offsets at corpus scale
    # can exceed 2^53, where double division stops being integer-exact.
    start_seq = F.expr(f"start_tok div {PACK_SEQ_LEN}")
    end_seq = F.expr(f"(start_tok + n_tokens - 1) div {PACK_SEQ_LEN}")
    return offsets.select(
        "doc_id", "shard", "n_tokens",
        start_seq.alias("start_seq"),
        (end_seq - start_seq + 1).alias("n_spans"),
    )


VOCAB_CUTOFFS = (50, 100, 200, 300, 400, 500, 1000, 2000, 5000)


@register(
    "vocab_growth_curve",
    rf"""
    WITH toks AS (
      SELECT doc_id, u.token
      FROM (SELECT doc_id,
                   string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    first_seen AS (
      SELECT token, MIN(doc_id) AS first_doc FROM toks GROUP BY token
    ),
    cutoffs AS (SELECT unnest([{", ".join(str(c) for c in VOCAB_CUTOFFS)}]) AS cutoff)
    SELECT CAST(c.cutoff AS BIGINT) AS cutoff,
           CAST(COUNT(f.token) AS BIGINT) AS vocab_size
    FROM cutoffs c LEFT JOIN first_seen f ON f.first_doc < c.cutoff
    GROUP BY CAST(c.cutoff AS BIGINT)
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct-token count after the first
    k documents (ingestion order), for a fixed cutoff ladder — the
    corpus-stats curve that tells you whether more crawl keeps buying
    new vocabulary (V ∝ N^β, β≈0.5 for natural text; a flattening curve
    means the source is exhausted, a linear one means boilerplate IDs or
    noise).

    Scale: token first-occurrence is ONE map-side-combined MIN groupBy
    (shared shape with ngram_novelty); the ladder join touches only the
    per-token first_doc rows, and the {len(VOCAB_CUTOFFS)}-row cutoff
    side broadcasts trivially. No per-prefix rescans."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(norm_text("text"), " ")).alias("token"))
    first_seen = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    cutoffs = d.sparkSession.createDataFrame(
        [(c,) for c in VOCAB_CUTOFFS], "cutoff BIGINT"
    )
    return (
        cutoffs.join(first_seen, first_seen.first_doc < cutoffs.cutoff, "left")
        .groupBy("cutoff")
        .agg(F.count("token").cast("bigint").alias("vocab_size"))
    )


CHUNK_TOKENS = 32  # tokens per chunk
CHUNK_STRIDE = 24  # chunk start spacing (overlap = CHUNK_TOKENS - this)
MAX_CHUNK_IDX = 256  # shared engine/oracle bound on chunks per document


@register(
    "document_chunking",
    rf"""
    WITH sized AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws,
             len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(i AS INT) AS chunk_idx,
             CAST(i * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
             ws[i * {CHUNK_STRIDE} + 1 :
                i * {CHUNK_STRIDE} + LEAST({CHUNK_TOKENS}, n - i * {CHUNK_STRIDE})] AS chunk
      FROM sized, generate_series(0, {MAX_CHUNK_IDX}) g(i)
      WHERE i <= LEAST((n - 1) // {CHUNK_STRIDE}, {MAX_CHUNK_IDX})
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
           CAST('0x' || substr(md5(array_to_string(chunk, ' ')), 1, 15) AS BIGINT)
             AS chunk_fp
    FROM chunks
    """,
)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style sliding-window document chunking: each document splits
    into {CHUNK_TOKENS}-token windows every {CHUNK_STRIDE} tokens
    ({CHUNK_TOKENS - CHUNK_STRIDE}-token overlap so no sentence straddles
    a hard boundary), the unit-of-retrieval transform that precedes
    embedding in a retrieval pipeline. Chunk identity is (doc_id,
    chunk_idx) plus a 60-bit md5 fingerprint of the chunk text — the
    stable key an embedding table joins back on (and the dedup handle
    for boilerplate chunks repeated across documents).

    Scale: map-only — tokenize, explode a per-document chunk-index
    sequence, slice; no shuffle at all (the parquet scan's partitioning
    is the output partitioning). Output rows ≈ docs x n_tokens/stride.
    MAX_CHUNK_IDX bounds chunks per document identically in both engines
    (DuckDB's generate_series takes only constant bounds), so a document
    longer than {MAX_CHUNK_IDX * CHUNK_STRIDE} tokens truncates — raise
    the constant for long-document corpora."""
    d = table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.split(norm_text("text"), " ").alias("ws"),
        F.size(F.split(norm_text("text"), " ")).alias("n"),
    )
    max_idx = F.least(
        F.expr(f"(n - 1) div {CHUNK_STRIDE}"), F.lit(MAX_CHUNK_IDX)
    ).cast("int")
    chunks = sized.select(
        "doc_id",
        "ws",
        "n",
        F.explode(F.sequence(F.lit(0), max_idx)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    chunk = F.slice(
        F.col("ws"), start + 1, F.least(F.lit(CHUNK_TOKENS), F.col("n") - start)
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        hex_hash64(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


BPE_TOP_PAIRS = 20


@register(
    "bpe_merge_candidates",
    rf"""
    WITH toks AS (
      SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    bg AS (
      SELECT ws[CAST(u.i AS INT)] AS a, ws[CAST(u.i AS INT) + 1] AS b
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u
      WHERE len(ws) >= 2
    ),
    counts AS (SELECT a, b, COUNT(*) AS n FROM bg GROUP BY a, b)
    SELECT a, b, CAST(n AS BIGINT) AS n_occurrences, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY n DESC, a ASC, b ASC) AS rank
      FROM counts
    ) WHERE rank <= {BPE_TOP_PAIRS}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core step of BPE/WordPiece tokenizer training, at corpus
    scale: count every ADJACENT token pair and rank the top
    {BPE_TOP_PAIRS} merge candidates (BPE training repeats exactly this
    scan after each merge; Sennrich et al. 2016). Distinct from the
    co-occurrence graph queries (pagerank/triangles build an undirected
    distinct-pair graph): here pairs are ordered, positional, and
    counted with multiplicity — the statistic the merge rule needs.

    Scale: adjacency is map-only (in-row transform over the token
    array, no self-join); one map-side-combined groupBy on the pair;
    the global top-k is a WindowGroupLimit-able rank over the (already
    tiny) distinct-pair counts. Deterministic total order:
    (count desc, a asc, b asc)."""
    d = table(spark, sf_dir, "documents")
    ws = F.split(norm_text("text"), " ")
    bigrams = d.select(ws.alias("ws")).filter(F.size("ws") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("a"),
                    F.element_at(F.col("ws"), i + F.lit(1)).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    counts = bigrams.groupBy("a", "b").agg(F.count("*").alias("n"))
    w = W.orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BPE_TOP_PAIRS)
        .select("a", "b", F.col("n").cast("bigint").alias("n_occurrences"), "rank")
    )


# ---- BM25 retrieval ---------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 5
BM25_QUERY_MAX = 20  # doc_id < this = the query set (same stand-in as
#                      benchmark_contamination's held-out bench docs)


@register(
    "bm25_topk",
    rf"""
    WITH toks AS (
      SELECT doc_id, u.token
      FROM (SELECT doc_id,
                   string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    corpus AS (SELECT * FROM toks WHERE doc_id >= {BM25_QUERY_MAX}),
    qterms AS (
      SELECT DISTINCT doc_id AS query_id, token FROM toks
      WHERE doc_id < {BM25_QUERY_MAX}
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM corpus
      WHERE token IN (SELECT token FROM qterms)
      GROUP BY doc_id, token
    ),
    doclen AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM corpus GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM corpus
    ),
    idf AS (
      SELECT f.token,
             CAST(floor(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) * 1e6)
                  AS BIGINT) AS q_idf
      FROM (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token) f,
           stats s
    ),
    scored AS (
      SELECT q.query_id, t.doc_id,
             CAST(floor(i.q_idf * (t.tf * ({BM25_K1} + 1.0))
                        / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                           + {BM25_B} * (CAST(l.len AS DOUBLE)
                                         / (CAST(s.n_toks AS DOUBLE) / s.n_docs)))))
                  AS BIGINT) AS term_q
      FROM tf t
      JOIN qterms q ON q.token = t.token
      JOIN idf i ON i.token = t.token
      JOIN doclen l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    agg AS (
      SELECT query_id, doc_id, CAST(SUM(term_q) AS BIGINT) AS score_q
      FROM scored GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score_q, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_q DESC, doc_id ASC) AS rank
      FROM agg
    ) WHERE rank <= {BM25_TOP}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{BM25_TOP} retrieval (Robertson/Spärck Jones Okapi
    weighting, k1={BM25_K1} b={BM25_B}): for each held-out query doc
    (doc_id < {BM25_QUERY_MAX}, set-of-words query — the same bench
    stand-in as benchmark_contamination), rank corpus documents by
    summed per-term BM25 — the lexical-retrieval side of a RAG stack
    next to the embedding ANN family, and the classic inverted-index
    workload.

    Cross-engine determinism: IDF rides the established quantized-ln
    idiom (floor(ln(·)·1e6) BIGINT); the tf saturation ratio uses only
    correctly-rounded ops (×, ÷, +) on that exact integer and exact
    counts, floored per term BEFORE the sum, so scores are int64 and
    the hash gate is exact.

    Scale: the corpus term-frequency groupBy is restricted to QUERY
    terms first (a broadcast semi-join — query vocab is tiny by
    definition), so the inverted index materializes only the postings
    the queries touch; doc lengths and corpus totals are map-side
    combined aggregates; the final per-query rank is
    WindowGroupLimit-prunable. No self-joins, no driver loops; at
    100 TB this is one scan + bounded-width shuffles."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(norm_text("text"), " ")).alias("token"))
    corpus = toks.filter(F.col("doc_id") >= BM25_QUERY_MAX)
    # r18 NOTE (measured rejection): the plan's ~6 tokenize subtrees (16
    # parquet scans) looked like a §5 caching candidate, but every
    # checkpoint variant (tf+qterms+doclen; doclen-only + stats derived
    # from it) measured a LOSS at sf0.1 (warm 2.2-2.7 s -> 2.6-2.9 s):
    # inside the one action the duplicate subtrees run as concurrent
    # stages, while eager checkpoints serialize jobs.
    qterms = (
        toks.filter(F.col("doc_id") < BM25_QUERY_MAX)
        .select(F.col("doc_id").alias("query_id"), "token")
        .distinct()
    )
    tf = (
        corpus.join(F.broadcast(qterms.select("token").distinct()), "token", "left_semi")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    doclen = corpus.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("len"))
    stats = corpus.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_toks"),
    )
    return _bm25_rank(tf, qterms, doclen, stats)


def _bm25_rank(
    tf: DataFrame, qterms: DataFrame, doclen: DataFrame, stats: DataFrame
) -> DataFrame:
    """BM25 IDF/saturation/rank over prepared frames — tf(doc_id, token,
    tf) already restricted to query vocabulary, doclen(doc_id, len),
    stats(n_docs, n_toks) 1-row, qterms(query_id, token) — factored out
    of bm25_topk so the streaming incremental-postings form ranks its
    maintained store with the identical arithmetic."""
    idf = (
        tf.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.floor(
                F.ln(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * 1e6
            )
            .cast("bigint")
            .alias("q_idf"),
        )
    )
    avglen = F.col("n_toks").cast("double") / F.col("n_docs")
    term_q = F.floor(
        F.col("q_idf")
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * (F.col("len").cast("double") / avglen))
        )
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(idf), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", term_q.alias("term_q"))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("term_q").cast("bigint").alias("score_q")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BM25_TOP)
        .select("query_id", "doc_id", "score_q", "rank")
    )


# ---- Contrastive negative sampling -------------------------------------
NEG_K = 3  # negatives per anchor document


@register(
    "contrastive_negatives",
    f"""
    WITH idx AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id ASC) - 1 AS i
      FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM idx),
    draws AS (
      SELECT a.doc_id AS anchor_doc_id, u.j AS neg_rank,
             CAST(concat('0x', substr(md5(concat('neg:', CAST(a.doc_id AS VARCHAR),
                                                ':', CAST(u.j AS VARCHAR))), 1, 15))
                  AS BIGINT) % n.n_docs AS draw_i,
             a.i AS self_i, n.n_docs AS n_docs
      FROM idx a, n,
           LATERAL (SELECT unnest(generate_series(1, {NEG_K})) AS j) u
    ),
    resolved AS (
      SELECT anchor_doc_id, CAST(neg_rank AS INT) AS neg_rank,
             CASE WHEN draw_i = self_i THEN (draw_i + 1) % n_docs
                  ELSE draw_i END AS neg_i
      FROM draws
    )
    SELECT r.anchor_doc_id, r.neg_rank, b.doc_id AS negative_doc_id
    FROM resolved r JOIN idx b ON b.i = r.neg_i
    """,
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive training
    (embedding/retrieval model data prep): each document draws {NEG_K}
    pseudo-random negatives from the corpus via an md5 hash ring —
    draw = hash('neg:' || doc_id || ':' || j) mod n over a dense
    doc-rank index, stepping one slot on self-collision. Deterministic
    (reproducible epochs, and the DuckDB oracle replays the identical
    draws) and uniform-ish without any RNG state.

    Scale: the dense rank comes from _banded_rank (quantile bands +
    partitioned windows + prefix-sum offsets — the range-partitioned
    zipWithIndex shape this docstring used to only PROMISE; round 10
    made the machinery shared, so the caveat became code); the draws
    themselves are map-only and the resolve is a single equi-join on
    the ring index, shuffling only anchor×{NEG_K} rows."""
    d = table(spark, sf_dir, "documents")
    ranked, _n = _banded_rank(d.select("doc_id", F.col("doc_id").alias("_k")), "_k", "_r")
    idx = ranked.select("doc_id", (F.col("_r") - 1).alias("i"))
    n = idx.agg(F.count("*").cast("bigint").alias("n_docs"))
    draws = (
        idx.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("anchor_doc_id"),
            F.col("i").alias("self_i"),
            "n_docs",
            F.explode(F.sequence(F.lit(1), F.lit(NEG_K))).alias("neg_rank"),
        )
        .select(
            "anchor_doc_id",
            F.col("neg_rank").cast("int").alias("neg_rank"),
            "n_docs",
            "self_i",
            (
                hex_hash64(
                    F.concat(
                        F.lit("neg:"),
                        F.col("anchor_doc_id").cast("string"),
                        F.lit(":"),
                        F.col("neg_rank").cast("string"),
                    )
                )
                % F.col("n_docs")
            ).alias("draw_i"),
        )
    )
    resolved = draws.select(
        "anchor_doc_id",
        "neg_rank",
        F.when(F.col("draw_i") == F.col("self_i"), (F.col("draw_i") + 1) % F.col("n_docs"))
        .otherwise(F.col("draw_i"))
        .alias("neg_i"),
    )
    return resolved.join(
        idx.select(F.col("i").alias("neg_i"), F.col("doc_id").alias("negative_doc_id")),
        "neg_i",
    ).select("anchor_doc_id", "neg_rank", "negative_doc_id")


# ---- Bigram LM quality --------------------------------------------------
@register(
    "bigram_logprob_quality",
    r"""
    WITH seqs AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM seqs,
           LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
      WHERE len(ws) >= 2
    ),
    uni AS (
      SELECT w1, CAST(floor(ln(COUNT(*)) * 1e6) AS BIGINT) AS q_ln_c1
      FROM bigrams GROUP BY w1
    ),
    bi AS (
      SELECT w1, w2, CAST(floor(ln(COUNT(*)) * 1e6) AS BIGINT) AS q_ln_c12
      FROM bigrams GROUP BY w1, w2
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(u.q_ln_c1 - b.q_ln_c12) AS BIGINT) AS surprisal_q,
           CAST(SUM(u.q_ln_c1 - b.q_ln_c12) AS DOUBLE) / COUNT(*) AS mean_surprisal_q
    FROM bigrams g
    JOIN uni u ON u.w1 = g.w1
    JOIN bi b ON b.w1 = g.w1 AND b.w2 = g.w2
    GROUP BY g.doc_id
    """,
)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean BIGRAM surprisal per document (micro-nats): -ln p(w2|w1) =
    ln c(w1·) - ln c(w1,w2) summed over a doc's adjacent pairs — the
    2-gram upgrade of unigram_logprob_quality, sensitive to word-ORDER
    degradation (shuffled or templated text scores fluent under a
    unigram LM but lights up here). Counts are corpus-trained in the
    same pass; both logs ride the established quantized-ln-of-integer-
    count idiom so every term and sum is int64-exact.

    Scale: bigram extraction is the map-only in-row adjacency transform
    (bpe_merge_candidates' shape); the conditional-count model is two
    token-keyed groupBys with map-side combine; the per-doc reduce
    joins occurrences against the (unbounded, hint-free) model tables
    on their natural keys — the exact plan shape of the unigram form,
    one extra join deep."""
    d = table(spark, sf_dir, "documents")
    seqs = d.select("doc_id", F.split(norm_text("text"), " ").alias("ws")).filter(
        F.size("ws") >= 2
    )
    bigrams = seqs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("w1"),
                    F.element_at(F.col("ws"), i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    uni = bigrams.groupBy("w1").agg(
        F.floor(F.ln(F.count("*")) * 1e6).cast("bigint").alias("q_ln_c1")
    )
    bi = bigrams.groupBy("w1", "w2").agg(
        F.floor(F.ln(F.count("*")) * 1e6).cast("bigint").alias("q_ln_c12")
    )
    joined = bigrams.join(uni, "w1").join(bi, ["w1", "w2"])
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("q_ln_c1") - F.col("q_ln_c12")).cast("bigint").alias("surprisal_q"),
    )
    return per_doc.select(
        "doc_id", "n_bigrams", "surprisal_q",
        (F.col("surprisal_q").cast("double") / F.col("n_bigrams")).alias(
            "mean_surprisal_q"
        ),
    )


# ---- Hybrid retrieval fusion (RRF) --------------------------------------
# Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009): combine a
# lexical ranking (BM25) and a dense ranking (embedding cosine) by
# summing 1/(K + rank) per system — THE standard hybrid-retrieval
# combiner because it needs no score calibration, only ranks. The two
# systems share the query/item id space here (vec_id == doc_id in the
# fixtures); items missing from one system contribute only the other's
# term, exactly the spec behavior.
RRF_K = 60
RRF_TOP = 5
RRF_QUERIES = 10  # intersection of bm25's (<20) and dense (<N_QUERIES=10)


def _rrf_oracle() -> str:
    from ..plans.registry import QUERIES as _REG

    bm = _REG["bm25_topk"].oracle
    dn = _REG["embedding_topk_bruteforce"].oracle
    return f"""
    WITH bm AS ({bm}),
    dn AS ({dn}),
    fused AS (
      SELECT COALESCE(b.query_id, d.query_id) AS query_id,
             COALESCE(b.doc_id, d.neighbor_id) AS item_id,
             COALESCE(1.0 / ({RRF_K} + b.rank), 0)
               + COALESCE(1.0 / ({RRF_K} + d.rank), 0) AS rrf_score
      FROM (SELECT * FROM bm WHERE query_id < {RRF_QUERIES}) b
      FULL JOIN dn d
        ON d.query_id = b.query_id AND d.neighbor_id = b.doc_id
    )
    SELECT query_id, item_id, rrf_score, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, item_id ASC) AS rank
      FROM fused
    ) WHERE rank <= {RRF_TOP}
    """


@register("hybrid_rrf_topk", _rrf_oracle)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: RRF-fuse the registered BM25 lexical ranking
    with the dense cosine ranking (see the block comment). Score =
    Σ 1/({RRF_K} + rank) over the systems that returned the item — two
    correctly-rounded divisions and one fixed-order add, so the fused
    ranking hash-gates exactly; the oracle nests both systems' full
    oracle chains and fuses identically.

    Scale: both inputs are already per-query top-k lists (queries × k
    rows); the fusion is a full outer join + window over that bounded
    set — a constant-cost epilogue like MMR, composable behind any of
    the ANN index families."""
    from ..operators.similarity import embedding_topk_bruteforce

    bm = bm25_topk(spark, sf_dir).filter(F.col("query_id") < RRF_QUERIES)
    dn = embedding_topk_bruteforce(spark, sf_dir)
    b = bm.select("query_id", F.col("doc_id").alias("item_id"), F.col("rank").alias("brank"))
    d = dn.select("query_id", F.col("neighbor_id").alias("item_id"), F.col("rank").alias("drank"))
    fused = b.join(d, ["query_id", "item_id"], "full_outer").select(
        "query_id", "item_id",
        (
            F.coalesce(F.lit(1.0) / (RRF_K + F.col("brank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (RRF_K + F.col("drank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col("item_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= RRF_TOP)
        .select("query_id", "item_id", "rrf_score", "rank")
    )


# ---- Language-cap mixture balancer --------------------------------------
LANG_CAP = 150  # max docs kept per language


@register(
    "language_cap_balance",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(concat('0x', substr(md5(concat('cap:', CAST(doc_id AS VARCHAR))),
                                                 1, 15)) AS BIGINT) ASC,
                        doc_id ASC) AS rn
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= {LANG_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn > {LANG_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM ranked GROUP BY lang
    """,
)
def language_cap_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard per-language cap — the mixture balancer next to
    temperature_resample's soft alpha-reweighting: keep at most
    {LANG_CAP} documents per language, chosen by a deterministic md5
    shuffle order (an unbiased sample that is reproducible across
    epochs and engines — ORDER BY a content hash IS a seeded shuffle),
    and report kept/dropped per language. The head-chopping guard
    against one dominant language drowning the mixture.

    Scale: one window per language partition (bounded partitions, each
    parallel) + a per-language aggregate; the md5 rank order means no
    RNG state and no skew beyond the language distribution itself."""
    d = table(spark, sf_dir, "documents")
    h = hex_hash64(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    wl = W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = d.select("doc_id", "lang", F.row_number().over(wl).alias("rn"))
    return ranked.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("rn") <= LANG_CAP, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("rn") > LANG_CAP, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
    )


# ---- DSIR-style importance resampling -----------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023): score every
# source document by how much its hashed-n-gram distribution looks like a
# TARGET corpus vs the source at large, then keep the top scorers. The
# feature space is hashed unigrams+bigrams folded into DSIR_BUCKETS
# buckets (the paper's "hashed n-gram features"); the per-bucket log
# importance weight ln p_target(b) - ln p_source(b) uses add-one
# smoothing, each logarithm quantized to micro-nats (floor(ln(x)*1e6)
# int64 — the house rule for the 1-ulp ln divergence) so document scores
# are exact int64 sums in both engines. Target = lang='en' documents
# (standing in for the paper's high-quality target corpus).
DSIR_BUCKETS = 512
DSIR_KEEP = 200


@register(
    "dsir_importance_select",
    rf"""
    WITH words AS (
      SELECT doc_id, lang,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang, t.g
      FROM words, LATERAL (SELECT unnest(ws) AS g) t
      UNION ALL
      SELECT doc_id, lang, ws[u.i] || ' ' || ws[u.i + 1] AS g
      FROM words,
           LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u
      WHERE len(ws) >= 2
    ),
    bucketed AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5('dsir:' || g), 1, 15)) AS BIGINT)
               % {DSIR_BUCKETS} AS b
      FROM grams
    ),
    srcc AS (SELECT b, COUNT(*) AS s_b FROM bucketed GROUP BY b),
    tgtc AS (SELECT b, COUNT(*) AS t_b FROM bucketed WHERE lang = 'en' GROUP BY b),
    tot AS (
      SELECT (SELECT COUNT(*) FROM bucketed) AS s_n,
             (SELECT COUNT(*) FROM bucketed WHERE lang = 'en') AS t_n
    ),
    wts AS (
      SELECT s.b,
             CAST(floor(ln(CAST(COALESCE(t.t_b, 0) + 1 AS DOUBLE)
                           / (tot.t_n + {DSIR_BUCKETS})) * 1e6) AS BIGINT)
           - CAST(floor(ln(CAST(s.s_b + 1 AS DOUBLE)
                           / (tot.s_n + {DSIR_BUCKETS})) * 1e6) AS BIGINT) AS q_w
      FROM srcc s LEFT JOIN tgtc t ON t.b = s.b, tot
    ),
    scored AS (
      SELECT bu.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(w.q_w) AS BIGINT) AS score_q
      FROM bucketed bu JOIN wts w ON w.b = bu.b
      GROUP BY bu.doc_id
    )
    SELECT doc_id, n_grams, score_q, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {DSIR_KEEP}
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (see block comment): hashed-n-gram importance
    weights target-vs-source, exact int64 micro-nat scores, top
    {DSIR_KEEP} documents by (score_q DESC, doc_id ASC).

    Scale: two map-side-combined groupBys build the bucket histograms
    ({DSIR_BUCKETS} rows each — broadcastable weight table no matter the
    corpus size); scoring is one join grams⋈weights (shuffle on the
    bucket key, uniform by construction of the hash) + one per-doc
    groupBy. The global top-K window is the only single-partition stage
    and sees one row per document; at 100 TB replace it with an
    approximate threshold + exact tail sort, or orderBy().limit() which
    Spark executes as per-partition top-K + merge."""
    scored = _dsir_scored(spark, sf_dir)
    w = W.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= DSIR_KEEP)
        .select("doc_id", "n_grams", "score_q", "rank")
    )


def _registry_queries():
    from ..plans.registry import QUERIES

    return QUERIES


_DSIR_MEMO: dict[tuple[str, str], DataFrame] = {}


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, score_q) — the DSIR importance scores before
    the top-K selection; shared by the exact window form and the
    approximate-threshold scalable form. Memoized per session like the
    other scorer frames (_scorer_memo contract)."""
    return _scorer_memo(
        spark, sf_dir, _DSIR_MEMO, "dsir_scorer", lambda: _dsir_scored_plan(spark, sf_dir)
    )


def _dsir_scored_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-memoized DSIR scoring plan."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(norm_text("text"), " ").alias("ws")
    )
    uni = d.select("doc_id", "lang", F.explode("ws").alias("g"))
    bi = d.filter(F.size("ws") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1), i -> ws[i - 1] || ' ' || ws[i])")
        ).alias("g"),
    )
    grams = uni.unionByName(bi)
    bucketed = grams.select(
        "doc_id",
        "lang",
        (hex_hash64(F.col("g"), salt="dsir:") % DSIR_BUCKETS).alias("b"),
    )
    srcc = bucketed.groupBy("b").agg(F.count("*").alias("s_b"))
    tgtc = (
        bucketed.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count("*").alias("t_b"))
    )
    tot = bucketed.agg(
        F.count("*").alias("s_n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_n"),
    )
    qln = lambda num, den: F.floor(F.log(num / den) * 1e6).cast("bigint")
    wts = (
        srcc.join(tgtc, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                qln(
                    (F.coalesce(F.col("t_b"), F.lit(0)) + 1).cast("double"),
                    (F.col("t_n") + DSIR_BUCKETS).cast("double"),
                )
                - qln(
                    (F.col("s_b") + 1).cast("double"),
                    (F.col("s_n") + DSIR_BUCKETS).cast("double"),
                )
            ).alias("q_w"),
        )
    )
    return (
        bucketed.join(F.broadcast(wts), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("q_w").cast("bigint").alias("score_q"),
        )
    )


@register(
    "dsir_topk_scalable",
    lambda: _registry_queries()["dsir_importance_select"].oracle,
)
def dsir_topk_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of dsir_importance_select's global top-K: instead
    of a single-partition row_number window over one row per document,
    (1) estimate the K-th score with percentile_approx, (2) filter to
    scores >= the estimate (distributed, map-side), (3) run the exact
    (score DESC, doc_id ASC) window on the SURVIVORS only. Correctness
    does not depend on the estimate's accuracy: if at least K rows pass
    the filter, the true top K all have score >= the K-th value >= the
    threshold, so they all survive and the exact window over survivors
    returns exactly the global answer — the estimate only sizes the
    tail. If the sketch overshoots (fewer than K survivors), the
    threshold steps down by the observed score range and retries; the
    loop is driver-side with one scalar collect per step and terminates
    at the global minimum. Hash-gated equal to dsir_importance_select
    (same oracle), so the rewrite IS the proof.

    Scale: the window input shrinks from N rows to O(K) survivors; the
    min/max/count stats and the percentile sketch are two map-side-
    combined scalar aggregates over the scored frame (production fuses
    them or caches `scored`; at 100 TB both are one-row-per-doc scans).
    This is the rewrite the exact query's docstring promises — kept as
    a separate registered query so both forms stay measured, and the
    driver-side threshold loop does bounded scalar collects only."""
    # One row per document; _dsir_scored is session-memoized
    # (localCheckpoint-materialized), so the stats pass, the percentile
    # sketch, the threshold-check loop, and the final filtered window
    # all read one materialization with no extra persist layer.
    scored = _dsir_scored(spark, sf_dir)
    stats = scored.agg(
        F.min("score_q").alias("lo"),
        F.max("score_q").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n <= DSIR_KEEP:
        thr = lo
    else:
        frac = max(0.0, 1.0 - DSIR_KEEP / n)
        thr = scored.agg(
            F.expr(f"percentile_approx(score_q, {frac}, 10000)")
        ).collect()[0][0]
        step = max((hi - lo) // 8, 1)
        while thr > lo and scored.filter(F.col("score_q") >= thr).count() < DSIR_KEEP:
            thr = max(lo, thr - step)
    survivors = scored.filter(F.col("score_q") >= thr)
    w = W.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= DSIR_KEEP)
        .select("doc_id", "n_grams", "score_q", "rank")
    )



# ---- Quality-scorer calibration curve -----------------------------------
# The eval-layer check every production quality filter needs (DataComp /
# CCNet practice): bucket the continuous quality score into deciles and
# measure agreement with an independent hard gate per bucket — a
# monotone pass-rate curve means the scorer ranks documents the way the
# gate filters them; a flat curve means the score is noise for this
# corpus. Scorer = mean unigram surprisal (micro-nats, lower = more
# typical text); reference label = the Gopher rule conjunction.
CALIB_BUCKETS = 10

# Gopher-gate labels as a reusable oracle CTE (shared by the surprisal
# calibration curve and the two-scorer comparison query).
_GOPHER_LABELS_CTE = rf"""labels AS (
      SELECT doc_id,
             (CAST(greatest(length(regexp_extract_all(text, '\S+')), 1) AS BIGINT)
                BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
             AND (CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                  / greatest(length(regexp_extract_all(text, '\S+')), 1)
                  BETWEEN {GOPHER_MIN_AWL} AND {GOPHER_MAX_AWL})
             AND (CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                  / greatest(length(regexp_extract_all(text, '\S+')), 1)
                  <= {GOPHER_MAX_SYMBOL_RATIO})
             AND (CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is)\b'))
                       AS BIGINT) >= {GOPHER_MIN_STOPWORD_HITS}) AS passes
      FROM documents
    )"""


@register(
    "quality_calibration_curve",
    rf"""
    WITH {_SURPRISAL_CTES},
    scored AS (
      SELECT doc_id,
             CAST(n_tokens * q_ln_total - sum_q AS DOUBLE) / n_tokens AS score
      FROM per_doc, tot
    ),
    {_GOPHER_LABELS_CTE},
    bucketed AS (
      SELECT s.doc_id, s.score, l.passes,
             ntile({CALIB_BUCKETS}) OVER (ORDER BY s.score ASC, s.doc_id ASC) AS bucket
      FROM scored s JOIN labels l ON l.doc_id = s.doc_id
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pass_frac,
           MIN(score) AS score_lo, MAX(score) AS score_hi
    FROM bucketed GROUP BY bucket
    """,
)
def quality_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve of the surprisal quality scorer against the
    Gopher rule gate (see block comment): {CALIB_BUCKETS} ntile buckets
    by (score ASC, doc_id ASC), per bucket the doc count, gate-pass
    count and fraction, and the score range.

    Cross-engine determinism: the score is the established micro-nat
    integer ratio; ntile over a TOTAL order is engine-agnostic (first
    n%k buckets get the extra row — SQL standard, both engines); the
    pass fraction is one correctly-rounded division of exact ints.

    Scale: scorer and gate are both scan-shaped (one token join + one
    projection); the global ntile is the only single-partition stage
    and sees one row per doc — at 100 TB replace with pre-computed
    score quantiles (approx_percentile) + a map-side bucket assignment,
    the same rewrite zorder_layout_audit documents."""
    surp = _doc_surprisal(spark, sf_dir).select(
        "doc_id",
        (F.col("surprisal_q").cast("double") / F.col("n_tokens")).alias("score"),
    )
    labels = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", F.col("passes_all").alias("passes")
    )
    w = W.orderBy(F.col("score").asc(), F.col("doc_id").asc())
    bucketed = (
        surp.join(labels, "doc_id")
        .withColumn("bucket", F.ntile(CALIB_BUCKETS).over(w).cast("int"))
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("bigint").alias("n_pass"),
        (
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("double") / F.count("*")
        ).alias("pass_frac"),
        F.min("score").alias("score_lo"),
        F.max("score").alias("score_hi"),
    )

def _nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (doc_id, score) under the learned naive-Bayes linear
    scorer (see _nb_scored_plan); memoized per session (_NB_MEMO)."""
    return _scorer_memo(
        spark, sf_dir, _NB_MEMO, "nb_scorer", lambda: _nb_scored_plan(spark, sf_dir)
    )


def _nb_scored_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (doc_id, score) under the learned naive-Bayes linear
    scorer: hashed uni+bigram DSIR buckets, per-bucket log-count-ratio
    weights fit on the Gopher-gate labels (micro-nat int64s), a
    document scores the MEAN weight of its grams. Shared by
    quality_calibration_scorers and the scorer-disagreement pair; the
    oracle twin is _NB_SCORE_CTES."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(norm_text("text"), " ").alias("ws")
    )
    uni = d.select("doc_id", F.explode("ws").alias("g"))
    bi = d.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1), i -> ws[i - 1] || ' ' || ws[i])")
        ).alias("g"),
    )
    gbuck = uni.unionByName(bi).select(
        "doc_id", (hex_hash64(F.col("g"), salt="nbq:") % DSIR_BUCKETS).alias("b")
    )
    labels = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", F.col("passes_all").alias("passes")
    )
    counts = (
        gbuck.join(labels, "doc_id")
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("p_b"),
            F.sum(F.when(F.col("passes"), 0).otherwise(1)).alias("f_b"),
        )
    )
    tots = counts.agg(F.sum("p_b").alias("p_n"), F.sum("f_b").alias("f_n"))
    qln = lambda num, den: F.floor(F.log(num / den) * 1e6).cast("bigint")
    wts = counts.crossJoin(F.broadcast(tots)).select(
        "b",
        (
            qln((F.col("p_b") + 1).cast("double"), (F.col("p_n") + DSIR_BUCKETS).cast("double"))
            - qln((F.col("f_b") + 1).cast("double"), (F.col("f_n") + DSIR_BUCKETS).cast("double"))
        ).alias("w"),
    )
    return (
        gbuck.join(F.broadcast(wts), "b")
        .groupBy("doc_id")
        .agg((F.sum("w").cast("double") / F.count("*")).alias("score"))
    )


# The naive-Bayes linear scorer's oracle chain (words → hashed-gram
# buckets → per-bucket pass/fail counts → log-count-ratio weights →
# per-doc mean-weight score). Requires {_GOPHER_LABELS_CTE} (for
# `labels`) earlier in the WITH list. Shared by
# quality_calibration_scorers and scorer_disagreement_select.
_NB_SCORE_CTES = rf"""words AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
      FROM documents
    ),
    grams AS (
      SELECT doc_id, t.g FROM words, LATERAL (SELECT unnest(ws) AS g) t
      UNION ALL
      SELECT doc_id, ws[u.i] || ' ' || ws[u.i + 1] AS g
      FROM words,
           LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u
      WHERE len(ws) >= 2
    ),
    gbuck AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5('nbq:' || g), 1, 15)) AS BIGINT)
               % {DSIR_BUCKETS} AS b
      FROM grams
    ),
    counts AS (
      SELECT b,
             SUM(CASE WHEN l.passes THEN 1 ELSE 0 END) AS p_b,
             SUM(CASE WHEN l.passes THEN 0 ELSE 1 END) AS f_b
      FROM gbuck g JOIN labels l ON l.doc_id = g.doc_id
      GROUP BY b
    ),
    tots AS (SELECT SUM(p_b) AS p_n, SUM(f_b) AS f_n FROM counts),
    wts AS (
      SELECT c.b,
             CAST(floor(ln(CAST(c.p_b + 1 AS DOUBLE) / (t.p_n + {DSIR_BUCKETS})) * 1e6) AS BIGINT)
           - CAST(floor(ln(CAST(c.f_b + 1 AS DOUBLE) / (t.f_n + {DSIR_BUCKETS})) * 1e6) AS BIGINT) AS w
      FROM counts c, tots t
    ),
    l_scored AS (
      SELECT g.doc_id, CAST(SUM(w.w) AS DOUBLE) / COUNT(*) AS score
      FROM gbuck g JOIN wts w ON w.b = g.b
      GROUP BY g.doc_id
    )"""


@register(
    "quality_calibration_scorers",
    rf"""
    WITH {_SURPRISAL_CTES},
    {_GOPHER_LABELS_CTE},
    s_scored AS (
      SELECT doc_id,
             CAST(n_tokens * q_ln_total - sum_q AS DOUBLE) / n_tokens AS score
      FROM per_doc, tot
    ),
    {_NB_SCORE_CTES},
    curves AS (
      SELECT 'surprisal' AS scorer, s.doc_id, s.score, l.passes,
             ntile({CALIB_BUCKETS}) OVER (ORDER BY s.score ASC, s.doc_id ASC) AS bucket
      FROM s_scored s JOIN labels l ON l.doc_id = s.doc_id
      UNION ALL
      SELECT 'nb_linear' AS scorer, s.doc_id, s.score, l.passes,
             ntile({CALIB_BUCKETS}) OVER (ORDER BY s.score ASC, s.doc_id ASC) AS bucket
      FROM l_scored s JOIN labels l ON l.doc_id = s.doc_id
    )
    SELECT scorer, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pass_frac,
           MIN(score) AS score_lo, MAX(score) AS score_hi
    FROM curves GROUP BY scorer, bucket
    """,
)
def quality_calibration_scorers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-scorer calibration comparison (round-8 verdict item 6): the
    surprisal scorer side by side with a LEARNED linear scorer — a
    closed-form naive-Bayes weighting of the DSIR hashed uni+bigram
    bucket features, trained on the Gopher-gate labels (per bucket b:
    w_b = qln((pass_b+1)/(pass_n+B)) - qln((fail_b+1)/(fail_n+B)),
    micro-nat int64s; a document scores the MEAN weight of its grams).
    Naive Bayes is the closed-form member of the logistic family over
    the same hashed features — linear in the features with
    log-count-ratio weights — so it is deterministic across engines
    where iteratively-fit logistic weights would not be. Output: one
    ntile-decile pass-rate curve per scorer, labeled by the `scorer`
    column; the learned curve should rise monotonically (it was fit on
    these labels — an IN-SAMPLE calibration, the standard training-fit
    diagnostic), while the surprisal curve shows how an UNSUPERVISED
    scorer tracks the same gate.

    Cross-engine determinism: hashed buckets via the shared 60-bit md5
    machinery; weights are differences of floor(ln(x)*1e6) int64s (the
    DSIR pattern, hash-verified there); per-doc scores are exact-int
    sums divided once (correctly rounded); both ntiles order by
    (score ASC, doc_id ASC).

    Scale: label join shuffles on doc_id; bucket histogram is a
    512-row map-side-combined groupBy; the weight table broadcasts;
    the global ntile is one row per doc with the same approx-quantile
    rewrite documented on quality_calibration_curve."""
    l_scored = _nb_scored(spark, sf_dir)
    labels = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", F.col("passes_all").alias("passes")
    )
    s_scored = _doc_surprisal(spark, sf_dir).select(
        "doc_id",
        (F.col("surprisal_q").cast("double") / F.col("n_tokens")).alias("score"),
    )

    def curve(scored: DataFrame, name: str) -> DataFrame:
        w = W.orderBy(F.col("score").asc(), F.col("doc_id").asc())
        return (
            scored.join(labels, "doc_id")
            .withColumn("bucket", F.ntile(CALIB_BUCKETS).over(w).cast("int"))
            .withColumn("scorer", F.lit(name))
        )
    both = curve(s_scored, "surprisal").unionByName(curve(l_scored, "nb_linear"))
    return both.groupBy("scorer", "bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("bigint").alias("n_pass"),
        (
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("double") / F.count("*")
        ).alias("pass_frac"),
        F.min("score").alias("score_lo"),
        F.max("score").alias("score_hi"),
    )



# ---- DoReMi-style domain reweighting --------------------------------------
# Domain-mixture optimization (Xie et al. 2023, "DoReMi: Optimizing Data
# Mixtures Speeds Up Language Model Pretraining"): multiplicative-weights
# updates boost domains whose loss EXCEEDS the current mixture-weighted
# average — the minimax/Group-DRO update that makes no domain's excess
# loss dominate. The published form uses a proxy model's per-domain excess
# log-perplexity; here the loss is the corpus's own per-token unigram
# surprisal (the same proxy the ccnet_bucket/quality pipeline already
# computes), and the exponentiated-gradient step is replaced by its
# standard LINEARIZED form w ← w·(1 + η·excess) so every round is exact
# int64 arithmetic (ppm weights, micro-nat losses) and the T-round
# trajectory is bit-identical across engines. Unlike a softmax over
# static per-domain losses, the update is genuinely iterative: the
# clipped excess is measured against the CURRENT weighted average, which
# moves every round.
DOREMI_ROUNDS = 8
DOREMI_ETA_Q = 1_000_000  # η = 1 (the DoReMi paper's step size), ppm-scaled
DOREMI_SMOOTH_Q = 50_000  # 5% uniform smoothing per round (DoReMi's s·u term)
_PPM = 1_000_000


def _doremi_mw_rounds(doms: list[tuple[str, int]]) -> dict[str, tuple[int, int]]:
    """Run the T-round integer multiplicative-weights loop over
    ``[(source, loss_q)]``; returns ``{source: (weight_ppm, boost_ppm)}``.

    Pure int64 arithmetic on positive operands (floor division == DuckDB
    ``//`` truncation for positives), mirrored term-for-term by the
    unrolled oracle CTEs in :func:`_doremi_oracle`."""
    u = _PPM // len(doms)
    w = {s: u for s, _ in doms}
    loss = dict(doms)
    for _ in range(DOREMI_ROUNDS):
        avg = sum(w[s] * loss[s] for s in w) // _PPM
        wp = {
            s: (w[s] * (_PPM + (DOREMI_ETA_Q * max(loss[s] - avg, 0)) // _PPM)) // _PPM
            for s in w
        }
        tot = sum(wp.values())
        w = {
            s: ((_PPM - DOREMI_SMOOTH_Q) * ((wp[s] * _PPM) // tot) + DOREMI_SMOOTH_Q * u)
            // _PPM
            for s in w
        }
    return {s: (w[s], (w[s] * _PPM) // u) for s in w}


def _doremi_oracle() -> str:
    # CTE-inlining discipline: DuckDB inlines (does not materialize)
    # non-recursive CTEs, so every round must reference its predecessor
    # EXACTLY ONCE or the plan doubles per round (2^T scans of
    # `documents` — observed as an EMFILE blow-up). Per-round scalars
    # (weighted-average loss, normalization total) therefore come from
    # unpartitioned window aggregates inside a single chained CTE
    # instead of separate aggregate CTEs, and every output column rides
    # the chain so the final SELECT reads only w{T}.
    parts = [
        f"""w0 AS (
      SELECT source, n_docs, n_tokens, L,
             CAST({_PPM} // (COUNT(*) OVER ()) AS BIGINT) AS u,
             CAST({_PPM} // (COUNT(*) OVER ()) AS BIGINT) AS w
      FROM (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(p.n_tokens * t.q_ln_total - p.sum_q)
                    // SUM(p.n_tokens) AS BIGINT) AS L
        FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id, tot t
        GROUP BY d.source
      )
    )"""
    ]
    for t in range(DOREMI_ROUNDS):
        parts.append(
            f"""w{t + 1} AS (
      SELECT source, n_docs, n_tokens, L, u,
             CAST((({_PPM} - {DOREMI_SMOOTH_Q}) * ((wp * {_PPM}) // (SUM(wp) OVER ()))
                   + {DOREMI_SMOOTH_Q} * u) // {_PPM} AS BIGINT) AS w
      FROM (
        SELECT source, n_docs, n_tokens, L, u,
               (w * ({_PPM} + ({DOREMI_ETA_Q} *
                  GREATEST(L - (SUM(w * L) OVER ()) // {_PPM}, 0)) // {_PPM}))
                 // {_PPM} AS wp
        FROM w{t}
      )
    )"""
        )
    chained = ",\n    ".join(parts)
    return f"""
    WITH {_SURPRISAL_CTES},
    {chained}
    SELECT source,
           n_docs,
           n_tokens,
           CAST(L AS BIGINT) AS loss_q,
           CAST(w AS BIGINT) AS weight_ppm,
           CAST((w * {_PPM}) // u AS BIGINT) AS boost_ppm
    FROM w{DOREMI_ROUNDS}
    """


@register("doremi_domain_reweight", _doremi_oracle)
def doremi_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain-mixture reweighting (see block comment):
    per-domain per-token surprisal loss from the corpus unigram model,
    then {DOREMI_ROUNDS} rounds of the clipped-excess multiplicative-
    weights update (linearized, ppm-integer exact) with per-round
    renormalization and {DOREMI_SMOOTH_Q}-ppm uniform smoothing. Output:
    one row per domain with its doc/token mass, micro-nat loss, final
    mixture weight (ppm) and boost vs the uniform mixture.

    Scale: the distributed work is the corpus-wide surprisal scoring
    (token-keyed vocab groupBy + join, per-doc reduce — the shared
    `_doc_surprisal` plan) and one per-SOURCE aggregation; the MW
    iteration itself runs on the collected per-domain table, which is
    bounded by domain cardinality (20 here; O(100) sources at 100 TB —
    the same bounded-driver-state pattern as kmeans_step's centroids).
    The weight table broadcasts back for the final projection."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    dom = (
        _doc_surprisal(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("surprisal_q").cast("bigint").alias("sur_q"),
        )
        .withColumn("loss_q", F.expr("sur_q div n_tokens").cast("bigint"))
        # Domain-cardinality rows; persisted so the bounded collect and
        # the final projection share ONE execution of the surprisal plan.
        # The returned frame joins against this cache — released by the
        # harness (session.release_persisted) after consumption.
        .persist()
    )
    defer_unpersist(dom)
    # Bounded collect: one row per domain (see scale note).
    rows = [(r["source"], r["loss_q"]) for r in dom.select("source", "loss_q").collect()]
    final = _doremi_mw_rounds(sorted(rows))
    wdf = spark.createDataFrame(
        [(s, int(w), int(b)) for s, (w, b) in final.items()],
        "source string, weight_ppm bigint, boost_ppm bigint",
    )
    return dom.join(F.broadcast(wdf), "source").select(
        "source", "n_docs", "n_tokens", "loss_q", "weight_ppm", "boost_ppm"
    )


# ---- Scorer-disagreement selection ----------------------------------------
# Dataset-cartography / active-learning selection (Swayamdipta et al.
# 2020's "ambiguous region", query-by-committee reduced to two
# members): documents on which the unsupervised surprisal scorer and
# the learned NB-linear scorer DISAGREE most are exactly the documents
# where a human label (or a stronger model's pass) buys the most
# information — the standard triage list a curation team reviews.
# Disagreement is measured in RANK space (|rank under scorer A − rank
# under scorer B|), which is scale-free: the two scores live in
# unrelated units, so score-space deltas are meaningless but rank
# deltas are comparable and integer-exact.
DISAGREE_K = 50

# Rank-biased overlap (Webber, Moffat & Zobel 2010): the standard
# top-weighted similarity between two rankings — here the two quality
# scorers' orderings. p fixes how fast attention decays down the list;
# the geometric weights are precomputed in Python as exact BIGINT
# fixed-point (floor(p^(d-1)·1e12)) and injected as literals into BOTH
# engines, so no engine ever evaluates pow() (not correctly-rounded).
RBO_DEPTH = 100
RBO_P = 0.9  # documentation only — the weights below are the contract
_RBO_W = [int((RBO_P ** (d - 1)) * 10**12) for d in range(1, RBO_DEPTH + 1)]


def _rbo_oracle() -> str:
    wts = ", ".join(f"({d}, {w})" for d, w in enumerate(_RBO_W, start=1))
    return rf"""
    WITH {_SURPRISAL_CTES},
    {_GOPHER_LABELS_CTE},
    {_NB_SCORE_CTES},
    s_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY
               CAST(n_tokens * q_ln_total - sum_q AS DOUBLE) / n_tokens ASC,
               doc_id ASC) AS r_s
      FROM per_doc, tot
    ),
    n_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score ASC, doc_id ASC) AS r_n
      FROM l_scored
    ),
    m AS (
      SELECT s.doc_id, greatest(s.r_s, n.r_n) AS md
      FROM s_ranked s JOIN n_ranked n ON n.doc_id = s.doc_id
      WHERE greatest(s.r_s, n.r_n) <= {RBO_DEPTH}
    ),
    rbo_w AS (SELECT * FROM (VALUES {wts}) AS t(d, w)),
    xd AS (
      SELECT t.d, t.w, CAST(COUNT(mm.md) AS BIGINT) AS x
      FROM rbo_w t LEFT JOIN m mm ON mm.md <= t.d
      GROUP BY t.d, t.w
    ),
    s AS (
      SELECT CAST(SUM(w * x // d) AS BIGINT) AS ssum,
             CAST(MAX(CASE WHEN d = {RBO_DEPTH} THEN x END) AS BIGINT)
               AS overlap_at_depth
      FROM xd
    )
    SELECT CAST({RBO_DEPTH} AS INT) AS depth,
           overlap_at_depth,
           CAST(ssum // 10000000 AS BIGINT) AS rbo_ppm
    FROM s
    """


@register("rbo_scorer_agreement", _rbo_oracle())
def rbo_scorer_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-BIASED OVERLAP between the two quality scorers' rankings —
    the top-weighted agreement statistic (Webber, Moffat & Zobel 2010)
    complementing scorer_disagreement_select's per-document triage:
    RBO@{RBO_DEPTH} = (1−p)·Σ_d p^(d−1)·X_d/d where X_d is the overlap
    of the two top-d prefixes (truncated prefix form; the residual
    extrapolation is omitted — monitoring wants the comparable prefix
    statistic). A falling RBO between the unsupervised surprisal
    scorer and the learned NB scorer is the drift alarm on the scorer
    pair itself. The geometric weights are exact BIGINT fixed-point
    literals shared by both engines; X_d derives from each common
    document's worse rank m = max(r_s, r_n) (in both top-d prefixes ⟺
    m ≤ d), so one ≤{RBO_DEPTH}-row frame carries the whole curve;
    every sum is integer.

    Scale: only the top-{RBO_DEPTH} of each ranking can contribute, so
    BOTH rank prefixes come from orderBy().limit() (TakeOrdered —
    per-partition heaps, no global window anywhere, unlike the exact
    disagreement query); the depth join is {RBO_DEPTH}×{RBO_DEPTH}
    rows; the scorer plans themselves are the shared memoized
    surprisal/NB passes."""
    DEPTH = RBO_DEPTH
    s_order = [
        (F.col("surprisal_q").cast("double") / F.col("n_tokens")).asc(),
        F.col("doc_id").asc(),
    ]
    s_top = (
        _doc_surprisal(spark, sf_dir)
        .orderBy(*s_order)
        .limit(DEPTH)
        .withColumn("r_s", F.row_number().over(W.orderBy(*s_order)).cast("bigint"))
        .select("doc_id", "r_s")
    )
    n_order = [F.col("score").asc(), F.col("doc_id").asc()]
    n_top = (
        _nb_scored(spark, sf_dir)
        .orderBy(*n_order)
        .limit(DEPTH)
        .withColumn("r_n", F.row_number().over(W.orderBy(*n_order)).cast("bigint"))
        .select("doc_id", "r_n")
    )
    m = s_top.join(n_top, "doc_id").select(
        F.greatest("r_s", "r_n").alias("md")
    )
    wts = spark.createDataFrame(
        list(enumerate(_RBO_W, start=1)), "d long, w long"
    )
    xd = (
        wts.join(F.broadcast(m), F.col("md") <= F.col("d"), "left")
        .groupBy("d", "w")
        .agg(F.count("md").cast("bigint").alias("x"))
    )
    s = xd.agg(
        F.sum(F.expr("w * x div d")).cast("bigint").alias("ssum"),
        F.max(F.when(F.col("d") == DEPTH, F.col("x")))
        .cast("bigint")
        .alias("overlap_at_depth"),
    )
    return s.select(
        F.lit(DEPTH).cast("int").alias("depth"),
        "overlap_at_depth",
        F.expr("CAST(ssum div 10000000 AS BIGINT)").alias("rbo_ppm"),
    )


@register(
    "scorer_disagreement_select",
    rf"""
    WITH {_SURPRISAL_CTES},
    {_GOPHER_LABELS_CTE},
    {_NB_SCORE_CTES},
    s_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY
               CAST(n_tokens * q_ln_total - sum_q AS DOUBLE) / n_tokens ASC,
               doc_id ASC) AS r_s
      FROM per_doc, tot
    ),
    n_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score ASC, doc_id ASC) AS r_n
      FROM l_scored
    )
    SELECT doc_id,
           CAST(r_s AS BIGINT) AS rank_surprisal,
           CAST(r_n AS BIGINT) AS rank_nb,
           CAST(abs(r_s - r_n) AS BIGINT) AS disagreement,
           CAST(pick AS INT) AS pick
    FROM (
      SELECT s.doc_id, s.r_s, n.r_n,
             row_number() OVER (ORDER BY abs(s.r_s - n.r_n) DESC, s.doc_id ASC)
               AS pick
      FROM s_ranked s JOIN n_ranked n ON n.doc_id = s.doc_id
    ) WHERE pick <= {DISAGREE_K}
    """,
)
def scorer_disagreement_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{DISAGREE_K} documents by rank disagreement between the
    unsupervised surprisal scorer and the learned NB-linear scorer (see
    block comment) — the curation triage list: each row carries both
    ranks, the absolute rank gap, and the pick order.

    Cross-engine determinism: both scores are exact-int ratios (one
    correctly-rounded division each), both row_numbers order by
    (score ASC, doc_id ASC) total orders, and every output column is an
    integer.

    Scale: two scorer plans (token-keyed shuffles, shared with their
    standalone queries) + two one-row-per-doc global rank windows and a
    doc_id-keyed join. The global windows carry the same documented
    100 TB rewrite as dsir_topk_scalable: pre-compute score quantiles
    and rank within bands, or use the sketch-threshold top-K for the
    final pick — disagreement only needs the TAIL of the rank gap."""
    s_ranked = _doc_surprisal(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(
            W.orderBy(
                (F.col("surprisal_q").cast("double") / F.col("n_tokens")).asc(),
                F.col("doc_id").asc(),
            )
        )
        .cast("bigint")
        .alias("r_s"),
    )
    n_ranked = _nb_scored(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").asc(), F.col("doc_id").asc()))
        .cast("bigint")
        .alias("r_n"),
    )
    joined = s_ranked.join(n_ranked, "doc_id").withColumn(
        "disagreement", F.abs(F.col("r_s") - F.col("r_n")).cast("bigint")
    )
    w = W.orderBy(F.col("disagreement").desc(), F.col("doc_id").asc())
    return (
        joined.withColumn("pick", F.row_number().over(w).cast("int"))
        .filter(F.col("pick") <= DISAGREE_K)
        .select(
            "doc_id",
            F.col("r_s").alias("rank_surprisal"),
            F.col("r_n").alias("rank_nb"),
            "disagreement",
            "pick",
        )
    )


# ---- Banded global rank (the 100 TB window rewrite) ------------------------
# A global row_number() with no partitionBy routes every row through ONE
# task — fine at one row per document and sf0.1, a scale-killer at 100 TB.
# The banded form is exact: split the score range into quantile bands
# (approximate boundaries — accuracy only shapes band balance, never the
# answer), rank WITHIN each band (parallel, partitioned window), and add
# the exact count of rows in all lower bands. Bounded driver state: B-1
# boundary doubles + B band counts. Worst case (every score identical)
# degenerates to one band = the status quo, never worse.
RANK_BANDS = 32


def _banded_rank(scored: DataFrame, score_col: str, rank_name: str):
    """Append ``rank_name`` = the exact global row_number under
    (score_col ASC, doc_id ASC) without a single-partition window;
    returns ``(ranked_df, total_rows)`` (the total falls out of the
    band-count pass for free — callers deriving rank arithmetic like
    ntile need it).

    Band assignment depends only on the score, so tied scores always
    share a band and the within-band (score, doc_id) order concatenated
    across bands IS the global total order; the prefix-sum offsets make
    the ranks globally exact regardless of how approximate the
    percentile boundaries are."""
    bounds = scored.agg(
        F.percentile_approx(
            score_col, [i / RANK_BANDS for i in range(1, RANK_BANDS)], 10000
        ).alias("bs")
    ).collect()[0]["bs"]
    uniq = sorted(set(bounds or []))
    band = F.lit(0)
    for b in uniq:
        band = band + F.when(F.col(score_col) >= F.lit(b), 1).otherwise(0)
    banded = scored.withColumn("_band", band.cast("int"))
    counts = {
        r["_band"]: r["n"]
        for r in banded.groupBy("_band").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    offmap = F.create_map(
        *[x for k in sorted(offsets) for x in (F.lit(k), F.lit(offsets[k]))]
    )
    w = W.partitionBy("_band").orderBy(F.col(score_col).asc(), F.col("doc_id").asc())
    ranked = banded.withColumn(
        rank_name,
        (offmap[F.col("_band")] + F.row_number().over(w)).cast("bigint"),
    ).drop("_band")
    return ranked, acc


def _ntile_from_rank(rank_col: str, n: int, buckets: int) -> Column:
    """SQL-standard ntile as closed-form arithmetic over an exact
    1-based rank: with q = n div B and r = n mod B, the first r buckets
    get q+1 rows. Pair with _banded_rank to get exact global ntiles
    from partitioned windows only (quality_calibration_scalable, the
    z-order layout audit, the per-group variant in
    value_histogram_equidepth_scalable)."""
    q, r = divmod(n, buckets)
    qd = max(q, 1)  # q=0 (n < B) never reaches the else branch
    return (
        F.when(
            F.col(rank_col) <= r * (q + 1),
            F.expr(f"({rank_col} - 1) div {q + 1} + 1"),
        )
        .otherwise(F.expr(f"{r} + ({rank_col} - {r * (q + 1)} - 1) div {qd} + 1"))
        .cast("int")
    )


@register(
    "scorer_disagreement_scalable",
    lambda: _registry_queries()["scorer_disagreement_select"].oracle,
)
def scorer_disagreement_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of scorer_disagreement_select (same oracle — the
    hash gate proves the rewrite): the exact query's three unpartitioned
    global row_number windows each route one-row-per-document through a
    single task. Here (1) both scorer ranks come from _banded_rank —
    quantile-banded, partition-parallel, exact; (2) the final top-K pick
    uses the dsir_topk_scalable sketch-threshold pattern: estimate the
    K-th disagreement with percentile_approx, filter to survivors
    (distributed, map-side), run the exact (disagreement DESC, doc_id)
    window on O(K) survivors only, stepping the threshold down if the
    sketch overshoots (driver-side scalar loop, terminates at the global
    minimum).

    Scale: two scorer plans (token-keyed shuffles, shared with their
    standalone queries) joined once on doc_id into ONE persisted
    two-score frame (ranking each score before vs after the join is
    equivalent — both scorers cover exactly the documents table — and
    the hash gate proves it); then bounded driver passes only: one agg
    for both boundary arrays + n, one (band_s x band_n) grouped count
    whose Python marginals give both prefix-offset maps, two
    band-partitioned rank windows back to back on the same frame (no
    post-rank join), one fused min/max/percentile agg for the
    disagreement threshold, and the exact pick window over O(K)
    survivors. Persisted frames are released by the harness
    (session.release_persisted)."""
    per_doc = defer_unpersist(
        _doc_surprisal(spark, sf_dir)
        .select(
            "doc_id",
            (F.col("surprisal_q").cast("double") / F.col("n_tokens")).alias("s"),
        )
        .join(_nb_scored(spark, sf_dir), "doc_id")
        .persist()
    )
    pcts = [i / RANK_BANDS for i in range(1, RANK_BANDS)]
    head = per_doc.agg(
        F.percentile_approx("s", pcts, 10000).alias("bs"),
        F.percentile_approx("score", pcts, 10000).alias("bn"),
        F.count("*").alias("n"),
    ).collect()[0]
    n = head["n"]

    def band_col(col: str, bounds) -> Column:
        b = F.lit(0)
        for v in sorted(set(bounds or [])):
            b = b + F.when(F.col(col) >= F.lit(v), 1).otherwise(0)
        return b.cast("int")

    banded = per_doc.withColumn("_bs", band_col("s", head["bs"])).withColumn(
        "_bn", band_col("score", head["bn"])
    )
    cells = banded.groupBy("_bs", "_bn").agg(F.count("*").alias("c")).collect()

    def offsets(axis: str):
        marg: dict[int, int] = {}
        for r in cells:
            marg[r[axis]] = marg.get(r[axis], 0) + r["c"]
        off, acc = {}, 0
        for k in sorted(marg):
            off[k] = acc
            acc += marg[k]
        return F.create_map(*[x for k in sorted(off) for x in (F.lit(k), F.lit(off[k]))])

    ranked = defer_unpersist(
        banded.withColumn(
            "r_s",
            (
                offsets("_bs")[F.col("_bs")]
                + F.row_number().over(
                    W.partitionBy("_bs").orderBy(F.col("s").asc(), F.col("doc_id").asc())
                )
            ).cast("bigint"),
        )
        .withColumn(
            "r_n",
            (
                offsets("_bn")[F.col("_bn")]
                + F.row_number().over(
                    W.partitionBy("_bn").orderBy(
                        F.col("score").asc(), F.col("doc_id").asc()
                    )
                )
            ).cast("bigint"),
        )
        .withColumn("disagreement", F.abs(F.col("r_s") - F.col("r_n")).cast("bigint"))
        .select("doc_id", "r_s", "r_n", "disagreement")
        .persist()
    )
    frac = max(0.0, 1.0 - DISAGREE_K / n) if n > DISAGREE_K else 0.0
    stats = ranked.agg(
        F.min("disagreement").alias("lo"),
        F.max("disagreement").alias("hi"),
        F.expr(f"percentile_approx(disagreement, {frac}, 10000)").alias("thr"),
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    thr = lo if n <= DISAGREE_K else stats["thr"]
    if n > DISAGREE_K:
        step = max((hi - lo) // 8, 1)
        while thr > lo and ranked.filter(F.col("disagreement") >= thr).count() < DISAGREE_K:
            thr = max(lo, thr - step)
    survivors = ranked.filter(F.col("disagreement") >= thr)
    w = W.orderBy(F.col("disagreement").desc(), F.col("doc_id").asc())
    return (
        survivors.withColumn("pick", F.row_number().over(w).cast("int"))
        .filter(F.col("pick") <= DISAGREE_K)
        .select(
            "doc_id",
            F.col("r_s").alias("rank_surprisal"),
            F.col("r_n").alias("rank_nb"),
            "disagreement",
            "pick",
        )
    )


@register(
    "quality_calibration_scalable",
    lambda: _registry_queries()["quality_calibration_curve"].oracle,
)
def quality_calibration_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of quality_calibration_curve (same oracle — the
    hash gate proves the rewrite): the exact query's global ntile is a
    single-partition window over one row per document. Here the bucket
    comes from _banded_rank plus closed-form ntile arithmetic — with n
    rows in {CALIB_BUCKETS} buckets, q = n div B and r = n mod B, the
    SQL-standard ntile (first r buckets get q+1 rows) is
      rank <= r*(q+1)  ->  (rank-1) div (q+1) + 1
      otherwise        ->  r + (rank - r*(q+1) - 1) div q + 1
    — a map-side expression over the exact banded rank, so the whole
    plan is scan + partitioned windows + one bucket groupBy.

    Scale: scorer and gate stay scan-shaped; the banded rank's driver
    state is B-1 boundaries + band counts; no stage funnels the corpus
    through one task (plan-shape CI locks it)."""
    surp = _doc_surprisal(spark, sf_dir).select(
        "doc_id",
        (F.col("surprisal_q").cast("double") / F.col("n_tokens")).alias("score"),
    )
    labels = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", F.col("passes_all").alias("passes")
    )
    scored = defer_unpersist(surp.join(labels, "doc_id").persist())
    ranked, n = _banded_rank(scored, "score", "rank")
    bucketed = ranked.withColumn("bucket", _ntile_from_rank("rank", n, CALIB_BUCKETS))
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("bigint").alias("n_pass"),
        (
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).cast("double") / F.count("*")
        ).alias("pass_frac"),
        F.min("score").alias("score_lo"),
        F.max("score").alias("score_hi"),
    )


SPLIT_BUCKETS = 1000
SPLIT_TRAIN_LT = 800  # buckets [0,800) -> train
SPLIT_VAL_LT = 900  # [800,900) -> val; [900,1000) -> test


@register(
    "dataset_split_assign",
    f"""
    WITH assign AS (
      SELECT lang,
             CAST(concat('0x', substr(md5(concat('sp|', doc_id)), 1, 15)) AS BIGINT)
               % {SPLIT_BUCKETS} AS b,
             len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
               AS n_toks
      FROM documents
    ),
    tagged AS (
      SELECT lang,
             CASE WHEN b < {SPLIT_TRAIN_LT} THEN 'train'
                  WHEN b < {SPLIT_VAL_LT} THEN 'val'
                  ELSE 'test' END AS split,
             n_toks
      FROM assign
    ),
    tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM tagged GROUP BY lang)
    SELECT t.lang, t.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t.n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) * 1000000 // tot.n_lang AS BIGINT) AS frac_ppm
    FROM tagged t JOIN tot ON tot.lang = t.lang
    GROUP BY t.lang, t.split, tot.n_lang
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment — the split
    every training run starts from, done the way it survives corpus
    growth: each document's split is a pure function of its stable key
    (md5 bucket of doc_id, {SPLIT_TRAIN_LT}/{SPLIT_VAL_LT - SPLIT_TRAIN_LT}/
    {SPLIT_BUCKETS - SPLIT_VAL_LT} per mille), so re-running on an
    APPENDED corpus never reassigns an existing document (no
    train->test leakage on refresh — the failure mode
    split_leakage_audit exists to catch) and needs no global shuffle,
    sort, or persisted assignment table. The report is the
    stratification audit: per (lang, split) document and token counts
    plus the realized per-language split fraction (ppm) against the
    {SPLIT_TRAIN_LT}/1000 target — hash-deviation is binomial, so
    small languages visibly wobble and that wobble is exactly what a
    mix designer needs to see before trusting a tiny val split.

    Scale: one map-only pass (hash + CASE + token count) and one
    (lang, split)-grain aggregate with map-side combine; the lang-total
    join is a broadcast of one row per language."""
    d = table(spark, sf_dir, "documents")
    assign = d.select(
        "lang",
        (hex_hash64(F.col("doc_id"), salt="sp|") % SPLIT_BUCKETS).alias("b"),
        F.size(F.split(norm_text("text"), " ")).alias("n_toks"),
    )
    tagged = assign.select(
        "lang",
        F.when(F.col("b") < SPLIT_TRAIN_LT, F.lit("train"))
        .when(F.col("b") < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "n_toks",
    )
    tot = tagged.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_lang"))
    return (
        tagged.groupBy("lang", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "split",
            "n_docs",
            "n_tokens",
            F.expr("CAST(n_docs * 1000000 div n_lang AS BIGINT)").alias("frac_ppm"),
        )
    )


@register(
    "quality_rule_ablation",
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(greatest(length(regexp_extract_all(text, '\\S+')), 1) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_nonspace,
             CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_symbols,
             CAST(length(regexp_extract_all(lower(text), '\\b(the|and|of|to|a|in|is)\\b')) AS BIGINT)
               AS n_stopwords
      FROM documents
    ),
    flags AS (
      SELECT n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS ok_wc,
             CAST(n_nonspace AS DOUBLE) / n_words
               BETWEEN {GOPHER_MIN_AWL} AND {GOPHER_MAX_AWL} AS ok_awl,
             CAST(n_symbols AS DOUBLE) / n_words <= {GOPHER_MAX_SYMBOL_RATIO} AS ok_sym,
             n_stopwords >= {GOPHER_MIN_STOPWORD_HITS} AS ok_stop
      FROM m
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN ok_wc AND ok_awl AND ok_sym AND ok_stop
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
             CAST(SUM(CASE WHEN NOT ok_wc THEN 1 ELSE 0 END) AS BIGINT) AS f_wc,
             CAST(SUM(CASE WHEN NOT ok_awl THEN 1 ELSE 0 END) AS BIGINT) AS f_awl,
             CAST(SUM(CASE WHEN NOT ok_sym THEN 1 ELSE 0 END) AS BIGINT) AS f_sym,
             CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS f_stop,
             CAST(SUM(CASE WHEN NOT ok_wc AND ok_awl AND ok_sym AND ok_stop
                           THEN 1 ELSE 0 END) AS BIGINT) AS fo_wc,
             CAST(SUM(CASE WHEN ok_wc AND NOT ok_awl AND ok_sym AND ok_stop
                           THEN 1 ELSE 0 END) AS BIGINT) AS fo_awl,
             CAST(SUM(CASE WHEN ok_wc AND ok_awl AND NOT ok_sym AND ok_stop
                           THEN 1 ELSE 0 END) AS BIGINT) AS fo_sym,
             CAST(SUM(CASE WHEN ok_wc AND ok_awl AND ok_sym AND NOT ok_stop
                           THEN 1 ELSE 0 END) AS BIGINT) AS fo_stop
      FROM flags
    )
    SELECT u.rule, u.n_fail, u.n_fail_only, a.n_docs, a.n_pass_all,
           (u.n_fail_only * 1000000) // a.n_docs AS marginal_ppm
    FROM agg a, LATERAL (
      SELECT 'word_count' AS rule, a.f_wc AS n_fail, a.fo_wc AS n_fail_only
      UNION ALL SELECT 'word_len', a.f_awl, a.fo_awl
      UNION ALL SELECT 'symbols', a.f_sym, a.fo_sym
      UNION ALL SELECT 'stopwords', a.f_stop, a.fo_stop
    ) u
    """,
)
def quality_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule ABLATION: per quality rule, how many documents fail
    it at all (n_fail) and how many fail ONLY it (n_fail_only — the
    documents that rule alone removes from the corpus). Marginal
    attribution is the number a curation owner needs before loosening
    any one gate: a rule with large n_fail but near-zero n_fail_only is
    redundant shadowing (its rejects die anyway), while a large
    n_fail_only means the rule single-handedly prices that much corpus.
    Composes gopher_quality_rules' flag frame (same expressions, same
    oracle CTE) into one conditional-aggregate row exploded to one row
    per rule.

    Scale: one map-only flag projection + one single-group aggregate —
    no shuffle beyond the final 1-row reduce; the 4-row explode is
    driver-free (explode of a literal-built array)."""
    flags = gopher_quality_rules(spark, sf_dir).select(
        "ok_word_count", "ok_word_len", "ok_symbols", "ok_stopwords"
    )
    wc, awl, sym, stp = (
        F.col("ok_word_count"),
        F.col("ok_word_len"),
        F.col("ok_symbols"),
        F.col("ok_stopwords"),
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    agg = flags.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        cnt(wc & awl & sym & stp).alias("n_pass_all"),
        cnt(~wc).alias("f_wc"),
        cnt(~awl).alias("f_awl"),
        cnt(~sym).alias("f_sym"),
        cnt(~stp).alias("f_stop"),
        cnt(~wc & awl & sym & stp).alias("fo_wc"),
        cnt(wc & ~awl & sym & stp).alias("fo_awl"),
        cnt(wc & awl & ~sym & stp).alias("fo_sym"),
        cnt(wc & awl & sym & ~stp).alias("fo_stop"),
    )
    rules = F.array(
        F.struct(F.lit("word_count").alias("rule"), F.col("f_wc").alias("n_fail"), F.col("fo_wc").alias("n_fail_only")),
        F.struct(F.lit("word_len").alias("rule"), F.col("f_awl").alias("n_fail"), F.col("fo_awl").alias("n_fail_only")),
        F.struct(F.lit("symbols").alias("rule"), F.col("f_sym").alias("n_fail"), F.col("fo_sym").alias("n_fail_only")),
        F.struct(F.lit("stopwords").alias("rule"), F.col("f_stop").alias("n_fail"), F.col("fo_stop").alias("n_fail_only")),
    )
    return (
        agg.select("n_docs", "n_pass_all", F.explode(rules).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_fail").alias("n_fail"),
            F.col("r.n_fail_only").alias("n_fail_only"),
            "n_docs",
            "n_pass_all",
            F.expr("(r.n_fail_only * 1000000) div n_docs").alias("marginal_ppm"),
        )
    )


KCORE_K = 30  # core level (fixture vocab is a 31-node dense graph, degrees 15-30)
KCORE_ROUNDS = 3  # fixed peel rounds (unrolled in the oracle)

_KCORE_EDGES_CTE = r"""
words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
  FROM documents
),
e0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM (
    SELECT ws[i] AS src, ws[i + 1] AS dst
    FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 1, 1))) AS i)
    WHERE len(ws) >= 2
  ) WHERE src <> dst
)
"""


def _kcore_round_cte(r: int) -> str:
    """Unrolled peel round r: degrees over e{r}, survivors with degree
    >= KCORE_K, edges e{r+1} with both endpoints surviving."""
    return f"""d{r} AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r}
  ) GROUP BY node
),
s{r} AS (SELECT node FROM d{r} WHERE d >= {KCORE_K}),
e{r + 1} AS (
  SELECT e.a, e.b FROM e{r} e
  JOIN s{r} sa ON sa.node = e.a
  JOIN s{r} sb ON sb.node = e.b
)"""


@register(
    "kcore_token_graph",
    f"""
    WITH {_KCORE_EDGES_CTE},
    {", ".join(_kcore_round_cte(r) for r in range(KCORE_ROUNDS))}
    SELECT u.round,
           u.n_nodes,
           u.n_edges
    FROM (
      {" UNION ALL ".join(
        f'''SELECT {r} AS round,
               (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM (
                  SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r})) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges'''
        for r in range(KCORE_ROUNDS + 1)
      )}
    ) u
    """,
)
def kcore_token_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling on the undirected token co-occurrence graph (the
    third graph-analytics member beside PageRank's convergence loop and
    the triangle enumeration): {KCORE_ROUNDS} fixed rounds of "drop
    every node with degree < {KCORE_K}, keep edges whose endpoints both
    survive", reporting nodes/edges after each round. The k-core is the
    standard dense-backbone extractor — for token graphs it separates
    the function-word backbone from long-tail content vocabulary, and
    the per-round shrink rate tells you how deep the peel must run
    before the core stabilizes (fixed unrolled rounds keep the oracle
    exact; production would loop to fixpoint with the same per-round
    plan, the PageRank-loop pattern).

    Scale: token-vocabulary edge lists are orders of magnitude smaller
    than the corpus (the dedup CC situation exactly), so below
    {{KCORE_LOCAL_EDGE_MAX}} edges the peel runs on the driver over the
    collected edge list (one corpus pass + a trivial loop — the
    size-gated fast path dedup's union-find established;
    equivalence-tested against the frames path). Above the gate, each
    round is one union-groupBy degree count (map-side combined) + two
    semi-shaped joins on the persisted edge frame — the same shuffle
    shapes as one PageRank round, the corpus tokenized exactly once."""
    d = table(spark, sf_dir, "documents")
    words = d.select(F.split(norm_text("text"), " ").alias("ws")).filter(
        F.size("ws") >= 2
    )
    bigrams = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 1, 1)), "
                "i -> struct(ws[i - 1] AS src, ws[i] AS dst))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = (
        bigrams.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    return _kcore_peel(spark, edges)


KCORE_LOCAL_EDGE_MAX = 200_000  # driver fast-path gate (edge rows)


def _kcore_peel(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """{KCORE_ROUNDS} peel rounds over an (a, b) edge frame → per-round
    (round, n_nodes, n_edges). Size-gated: driver loop below
    {KCORE_LOCAL_EDGE_MAX} edges, per-round DataFrame plan above
    (identical fixpoint semantics — tests force the frames path and
    compare)."""
    from ..session import defer_unpersist

    edges = defer_unpersist(edges.persist())
    n_edges = edges.count()
    if n_edges <= KCORE_LOCAL_EDGE_MAX:
        import pandas as pd

        es = [(r.a, r.b) for r in edges.collect()]
        rows = []
        for r in range(KCORE_ROUNDS + 1):
            deg: dict = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            rows.append((r, len(deg), len(es)))
            if r == KCORE_ROUNDS:
                break
            surv = {n for n, dv in deg.items() if dv >= KCORE_K}
            es = [(a, b) for a, b in es if a in surv and b in surv]
        # Arrow path: createDataFrame(python_list) costs 5-8 s for tiny
        # frames (one task evaluates 32 parent Python partitions).
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["round", "n_nodes", "n_edges"]),
            schema="round int, n_nodes bigint, n_edges bigint",
        )
    stats = []
    cur = edges
    for r in range(KCORE_ROUNDS + 1):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("bigint").alias("d"))
        )
        stats.append(
            deg.agg(
                F.count("*").cast("bigint").alias("n_nodes"),
                (F.coalesce(F.sum("d"), F.lit(0)) / 2).cast("bigint").alias("n_edges"),
            ).select(F.lit(r).cast("int").alias("round"), "n_nodes", "n_edges")
        )
        if r == KCORE_ROUNDS:
            break
        surv = deg.filter(F.col("d") >= KCORE_K).select("node")
        cur = defer_unpersist(
            cur.join(surv.withColumnRenamed("node", "a"), "a")
            .join(surv.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
            .persist()
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


# ---- BM25 with pseudo-relevance feedback (RM3-style expansion) -----------
PRF_FB_DOCS = 3  # feedback depth: top docs of the first pass
PRF_EXP_TERMS = 5  # expansion terms added per query


@register(
    "bm25_prf_topk",
    rf"""
    WITH toks AS (
      SELECT doc_id, u.token
      FROM (SELECT doc_id,
                   string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    corpus AS (SELECT * FROM toks WHERE doc_id >= {BM25_QUERY_MAX}),
    qterms AS (
      SELECT DISTINCT doc_id AS query_id, token FROM toks
      WHERE doc_id < {BM25_QUERY_MAX}
    ),
    doclen AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM corpus GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM corpus
    ),
    tf1 AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM corpus WHERE token IN (SELECT token FROM qterms)
      GROUP BY doc_id, token
    ),
    idf1 AS (
      SELECT f.token,
             CAST(floor(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) * 1e6)
                  AS BIGINT) AS q_idf
      FROM (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf1 GROUP BY token) f,
           stats s
    ),
    agg1 AS (
      SELECT q.query_id, t.doc_id,
             CAST(SUM(CAST(floor(i.q_idf * (t.tf * ({BM25_K1} + 1.0))
                        / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                           + {BM25_B} * (CAST(l.len AS DOUBLE)
                                         / (CAST(s.n_toks AS DOUBLE) / s.n_docs)))))
                  AS BIGINT)) AS BIGINT) AS score_q
      FROM tf1 t
      JOIN qterms q ON q.token = t.token
      JOIN idf1 i ON i.token = t.token
      JOIN doclen l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, t.doc_id
    ),
    fb AS (
      SELECT query_id, doc_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score_q DESC, doc_id ASC) AS r
        FROM agg1
      ) WHERE r <= {PRF_FB_DOCS}
    ),
    fbtf AS (
      SELECT f.query_id, c.token, CAST(COUNT(*) AS BIGINT) AS tf_fb
      FROM fb f JOIN corpus c ON c.doc_id = f.doc_id
      GROUP BY f.query_id, c.token
    ),
    fbidf AS (
      SELECT g.token,
             CAST(floor(ln((s.n_docs - g.df + 0.5) / (g.df + 0.5) + 1.0) * 1e6)
                  AS BIGINT) AS q_idf
      FROM (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM corpus WHERE token IN (SELECT DISTINCT token FROM fbtf)
            GROUP BY token) g,
           stats s
    ),
    expansion AS (
      SELECT query_id, token FROM (
        SELECT x.query_id, x.token,
               row_number() OVER (PARTITION BY x.query_id
                                  ORDER BY (x.tf_fb * i.q_idf) DESC, x.token ASC) AS r
        FROM fbtf x
        JOIN fbidf i ON i.token = x.token
        LEFT JOIN qterms q0 ON q0.query_id = x.query_id AND q0.token = x.token
        WHERE q0.token IS NULL
      ) WHERE r <= {PRF_EXP_TERMS}
    ),
    qterms2 AS (
      SELECT query_id, token FROM qterms
      UNION
      SELECT query_id, token FROM expansion
    ),
    tf2 AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM corpus WHERE token IN (SELECT DISTINCT token FROM qterms2)
      GROUP BY doc_id, token
    ),
    idf2 AS (
      SELECT f.token,
             CAST(floor(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) * 1e6)
                  AS BIGINT) AS q_idf
      FROM (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf2 GROUP BY token) f,
           stats s
    ),
    agg2 AS (
      SELECT q.query_id, t.doc_id,
             CAST(SUM(CAST(floor(i.q_idf * (t.tf * ({BM25_K1} + 1.0))
                        / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                           + {BM25_B} * (CAST(l.len AS DOUBLE)
                                         / (CAST(s.n_toks AS DOUBLE) / s.n_docs)))))
                  AS BIGINT)) AS BIGINT) AS score_q
      FROM tf2 t
      JOIN qterms2 q ON q.token = t.token
      JOIN idf2 i ON i.token = t.token
      JOIN doclen l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, t.doc_id
    )
    SELECT query_id, doc_id, score_q, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_q DESC, doc_id ASC) AS rank
      FROM agg2
    ) WHERE rank <= {BM25_TOP}
    """,
)
def bm25_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with pseudo-relevance feedback (the RM3-style two-pass
    ranker, Abdul-Jaleel et al. 2004): pass 1 = plain BM25; the top
    {PRF_FB_DOCS} docs per query are ASSUMED relevant, their
    {PRF_EXP_TERMS} highest tf-idf terms NOT already in the query are
    appended, and pass 2 re-ranks with the expanded query — the classic
    vocabulary-mismatch fix that lifts lexical recall without any
    model. Every query doc here misses 3-21 of the corpus' tokens, so
    expansion is live for all of them.

    Determinism: the expansion pick ranks on an exact integer
    (tf_fb x quantized-ln idf) with a token tie-break; both BM25 passes
    ride bm25_topk's established integer arithmetic (per-term floor
    before the sum), so the whole two-pass pipeline hash-verifies.

    Scale: pass 1 is bm25_topk's plan; feedback-doc term harvesting
    joins the {PRF_FB_DOCS}-per-query doc list (broadcast) back to the
    corpus token stream; pass 2 re-runs the postings-restricted rank
    over the expanded (still tiny) vocabulary. Two scans of the corpus
    token stream total — at 100 TB both passes prune to query-touched
    postings, which is the definition of an inverted-index workload."""
    corpus, doclen, stats, qterms, expansion = _prf_frames(spark, sf_dir)
    qterms2 = qterms.unionByName(expansion).distinct()
    tf2 = _prf_tf(corpus, qterms2.select("token").distinct())
    return _bm25_rank(tf2, qterms2, doclen, stats)


def _prf_tf(corpus: DataFrame, vocab: DataFrame) -> DataFrame:
    """Postings-restricted term frequencies: the inverted-index prune —
    only corpus token rows whose token is in the (tiny, broadcast)
    vocabulary survive to the tf aggregate."""
    return (
        corpus.join(F.broadcast(vocab), "token", "left_semi")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def _prf_frames(spark: SparkSession, sf_dir: str):
    """The PRF pipeline up through the expansion pick: returns (corpus
    postings, doclen, stats, qterms, expansion). Factored out of
    bm25_prf_topk so the scale_bench @probe instrument can count the
    postings each pass's vocabulary prune actually touches with the
    exact production frames."""
    from ..session import defer_unpersist

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(norm_text("text"), " ")).alias("token"))
    # r18 (guide §5): the two-pass PRF pipeline consumes this posting
    # stream in five separate subtrees across three jobs (pass-1
    # tf/doclen/stats under the fb checkpoint, fbtf/fbdf under the
    # expansion checkpoint, pass-2 tf/doclen/stats in the final job);
    # un-persisted, every subtree re-tokenized the documents scan. One
    # in-query persist (harness-released after the action — never a
    # cross-run cache) pays the tokenize once.
    corpus = defer_unpersist(
        toks.filter(F.col("doc_id") >= BM25_QUERY_MAX).persist()
    )
    qterms = (
        toks.filter(F.col("doc_id") < BM25_QUERY_MAX)
        .select(F.col("doc_id").alias("query_id"), "token")
        .distinct()
    )
    doclen = corpus.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("len"))
    stats = corpus.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_toks"),
    )

    tf1 = _prf_tf(corpus, qterms.select("token").distinct())
    pass1 = _bm25_rank(tf1, qterms, doclen, stats)
    # Feedback docs and expansion terms are tiny by construction
    # (queries x {PRF_FB_DOCS} / x {PRF_EXP_TERMS} rows) but sit at the
    # root of pass 1's whole DAG — localCheckpoint them so the several
    # pass-2 references replay a {PRF_FB_DOCS}-row frame, not two full
    # BM25 plans (measured 15s -> ~3s at sf0.1; the pair-graph memo's
    # materialize-the-small-thing rationale).
    fb = (
        pass1.filter(F.col("rank") <= PRF_FB_DOCS)
        .select("query_id", "doc_id")
        .localCheckpoint(eager=True)
    )
    fbtf = (
        corpus.join(F.broadcast(fb), "doc_id")
        .groupBy("query_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf_fb"))
    )
    fbdf = (
        corpus.join(
            F.broadcast(fbtf.select("token").distinct()), "token", "left_semi"
        )
        .groupBy("token")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("df"))
    )
    fbidf = fbdf.crossJoin(F.broadcast(stats)).select(
        "token",
        F.floor(
            F.ln((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * 1e6
        )
        .cast("bigint")
        .alias("q_idf"),
    )
    wexp = W.partitionBy("query_id").orderBy(
        (F.col("tf_fb") * F.col("q_idf")).desc(), F.col("token").asc()
    )
    expansion = (
        fbtf.join(F.broadcast(fbidf), "token")
        .join(qterms, ["query_id", "token"], "left_anti")
        .withColumn("r", F.row_number().over(wexp))
        .filter(F.col("r") <= PRF_EXP_TERMS)
        .select("query_id", "token")
        .localCheckpoint(eager=True)
    )
    return corpus, doclen, stats, qterms, expansion


@register(
    "clustering_coefficient_nodes",
    f"""
    WITH {_PR_GRAPH_CTE},
    undirected AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM undirected UNION ALL SELECT b FROM undirected
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS lo,
             CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS hi
      FROM undirected u
      JOIN deg da ON da.node = u.a
      JOIN deg db ON db.node = u.b
    ),
    triangles AS (
      SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM oriented e1
      JOIN oriented e2 ON e2.lo = e1.hi
      JOIN oriented e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (
        SELECT x AS node FROM triangles
        UNION ALL SELECT y FROM triangles
        UNION ALL SELECT z FROM triangles
      ) GROUP BY node
    )
    SELECT deg.node AS token, deg.d AS degree,
           CAST(COALESCE(per_node.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(floor(CAST(2 * COALESCE(per_node.n_triangles, 0) * 1000000
                           AS DOUBLE) / (deg.d * (deg.d - 1))) AS BIGINT)
             AS clustering_q
    FROM deg LEFT JOIN per_node ON per_node.node = deg.node
    WHERE deg.d >= 2
    """,
)
def clustering_coefficient_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per token — the per-node ratio form
    of the triangle count (Watts–Strogatz): cc(v) = 2·tri(v) /
    (d(v)·(d(v)−1)) for every node of degree ≥ 2, quantized to micro
    units (the numerator and denominator are exact BIGINTs; one
    correctly-rounded divide then floor — the established parity
    pattern). Function-word hubs sit in dense neighborhoods (cc → 1);
    bridge tokens connect otherwise-separate contexts (cc → 0) — the
    standard graph feature for stopword/topic-boundary detection.

    Scale: shares _token_graph_triangles with the top-K report — degree
    aggregate + the degree-ordered two-join enumeration (per-node wedge
    work O(out-degree²), out-degree bounded under the orientation), one
    broadcast-sized left join at token-vocabulary grain."""
    deg, per_node = _token_graph_triangles(spark, sf_dir)
    return (
        deg.filter(F.col("d") >= 2)
        .join(per_node, deg["node"] == per_node["node"], "left")
        .select(
            deg["node"].alias("token"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.floor(
                (2 * F.coalesce(F.col("n_triangles"), F.lit(0)) * 1000000)
                .cast("double")
                / (F.col("d") * (F.col("d") - 1))
            )
            .cast("bigint")
            .alias("clustering_q"),
        )
    )


# ---- Exact scorer AUC (Mann–Whitney rank-sum) ----------------------------
AUC_SCORE_Q = 1000  # per-word stopword-hit rate quantized to 0..AUC_SCORE_Q


def _auc_oracle() -> str:
    return rf"""
    WITH m AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             length(regexp_extract_all(lower(text), '{LANG_PATTERNS["en"]}'))
               AS hits,
             greatest(length(regexp_extract_all(text, '\S+')), 1) AS n_words
      FROM documents
    ),
    q AS (
      SELECT pos, CAST((hits * {AUC_SCORE_Q}) // n_words AS BIGINT) AS s_q
      FROM m
    ),
    cells AS (
      SELECT s_q, CAST(SUM(pos) AS BIGINT) AS n1, COUNT(*) AS n
      FROM q GROUP BY s_q
    ),
    r AS (
      SELECT s_q, n1, n,
             COALESCE(SUM(n) OVER (ORDER BY s_q ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_lt
      FROM cells
    ),
    agg AS (
      SELECT CAST(SUM(n1 * (2 * cum_lt + n + 1)) AS BIGINT) AS ranksum2,
             CAST(SUM(n1) AS BIGINT) AS n_pos,
             CAST(SUM(n) AS BIGINT) AS n_tot
      FROM r
    )
    SELECT n_pos, n_tot - n_pos AS n_neg,
           CAST(((ranksum2 - n_pos * (n_pos + 1)) * 1000000)
                // (2 * n_pos * (n_tot - n_pos)) AS BIGINT) AS auc_q
    FROM agg
    WHERE n_pos > 0 AND n_tot > n_pos
    """


@register("scorer_auc_eval", _auc_oracle())
def scorer_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of a scorer against labels — the
    Mann–Whitney/rank-sum identity (AUC = P(score⁺ > score⁻) +
    ½·P(tie)), evaluated here for the per-word English-stopword rate
    predicting lang == 'en' (the langid_heuristic signal scored as a
    retrieval-quality instrument, joining the calibration/NDCG eval
    family). Tie handling is the proper mid-rank correction, computed
    EXACTLY in integers: 2·ranksum = Σ_s n⁺(s)·(2·cum_lt(s) + n(s) + 1)
    over DISTINCT quantized scores, then
    AUC = (2·ranksum − 2·binom) / (2·n⁺·n⁻) quantized to micro-units
    with integer division — no float ranks anywhere, bit-identical
    cross-engine.

    Scale: one map-only scoring pass, one groupBy on the quantized
    score ({AUC_SCORE_Q + 1} cells max — quantization is what BOUNDS
    the score frame), and a prefix-sum window over that bounded frame
    (the banded-ECDF rationale from ks_two_sample_scalable: the window
    input is cells, never rows). Caveat noted for honesty: the exact
    integer 2·ranksum stays under 2^63 up to ~10⁹ docs per class;
    beyond that the final ratio must quantize before the multiply."""
    d = table(spark, sf_dir, "documents")
    m = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        _matches(F.lower(F.col("text")), LANG_PATTERNS["en"]).alias("hits"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)), F.lit(1)
        ).alias("n_words"),
    )
    q = m.select(
        "pos", F.expr(f"CAST((hits * {AUC_SCORE_Q}) div n_words AS BIGINT)").alias("s_q")
    )
    cells = q.groupBy("s_q").agg(
        F.sum("pos").cast("bigint").alias("n1"),
        F.count("*").alias("n"),
    )
    w = W.orderBy(F.col("s_q").asc()).rowsBetween(W.unboundedPreceding, -1)
    r = cells.withColumn(
        "cum_lt", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    agg = r.agg(
        F.sum(F.col("n1") * (2 * F.col("cum_lt") + F.col("n") + 1))
        .cast("bigint")
        .alias("ranksum2"),
        F.sum("n1").cast("bigint").alias("n_pos"),
        F.sum("n").cast("bigint").alias("n_tot"),
    )
    # AUC is undefined on a one-class corpus (n⁺ or n⁻ = 0) and
    # zero-division behavior differs cross-engine — both sides emit
    # zero rows for that degenerate input instead (ADVICE r13).
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_tot") > F.col("n_pos")))
        .select(
            "n_pos",
            (F.col("n_tot") - F.col("n_pos")).alias("n_neg"),
            F.expr(
                "CAST(((ranksum2 - n_pos * (n_pos + 1)) * 1000000)"
                " div (2 * n_pos * (n_tot - n_pos)) AS BIGINT)"
            ).alias("auc_q"),
        )
    )


# ---- Training sequence packing (concatenate-and-split batch prep) --------
# The batch-materialization step every LLM training pipeline runs after
# curation: documents concatenate in a deterministic order and split
# into fixed-length context windows (GPT-style packing WITH document
# splitting — zero padding except the final window of each domain).
# The plan query assigns every document its window coordinates; the
# report query prices the packing (windows, boundary fragmentation,
# tail padding) per language domain.
PACK_SEQ_LEN = 512   # tokens per training sequence
PACK_BUCKET = 64     # doc_ids per prefix-sum bucket (two-level cumsum)

_PACK_PLAN_CTE = rf"""
    toks AS (
      SELECT doc_id, lang,
             CAST(length(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    nz AS (SELECT * FROM toks WHERE n_tokens > 0),
    plan AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS startpos
      FROM nz
    )"""


def _pack_tokens(df: DataFrame) -> DataFrame:
    """(doc_id, lang, text) → positive BPE-ish token counts — the
    packing unit shared by the batch plan and the incremental packing
    store's per-epoch ingest."""
    bpe_pat = F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    return df.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all("text", bpe_pat, 0))
        .cast("bigint")
        .alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)


def _pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing coordinates via a TWO-LEVEL prefix sum (the
    scalable form of `SUM() OVER (PARTITION BY lang ORDER BY doc_id)`):
    docs bucket by doc_id div {PACK_BUCKET}, the running sum windows
    partition by (lang, bucket) — never a whole domain in one task —
    and per-bucket totals (corpus/{PACK_BUCKET} rows) carry the
    cross-bucket offsets through one tiny per-lang window + broadcast
    join back (the banded-ECDF distributed-prefix-sum shape). The hash
    gate against the single-window oracle proves two-level ==
    one-window."""
    return _pack_plan_frame(_pack_tokens(table(spark, sf_dir, "documents")))


def _pack_plan_frame(toks: DataFrame) -> DataFrame:
    """The two-level prefix sum over a (doc_id, lang, n_tokens) frame
    (see _pack_plan); factored so the incremental packing store can run
    the identical recurrence on one epoch's batch and offset it by the
    stored per-domain totals."""
    toks = toks.withColumn(
        "_bkt", F.expr(f"doc_id div {PACK_BUCKET}").cast("bigint")
    )
    w_in = (
        W.partitionBy("lang", "_bkt")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    within = toks.withColumn("_cum_in", F.sum("n_tokens").over(w_in))
    btot = toks.groupBy("lang", "_bkt").agg(F.sum("n_tokens").alias("_bt"))
    w_b = (
        W.partitionBy("lang")
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    boff = btot.withColumn(
        "_boff", F.coalesce(F.sum("_bt").over(w_b), F.lit(0))
    ).select("lang", "_bkt", "_boff")
    return (
        within.join(F.broadcast(boff), ["lang", "_bkt"])
        .withColumn(
            "startpos", F.col("_boff") + F.col("_cum_in") - F.col("n_tokens")
        )
        .select("doc_id", "lang", "n_tokens", "startpos")
    )


@register(
    "sequence_packing_plan",
    f"""
    WITH {_PACK_PLAN_CTE}
    SELECT doc_id, lang, n_tokens,
           CAST(startpos // {PACK_SEQ_LEN} AS BIGINT) AS first_seq,
           CAST(startpos % {PACK_SEQ_LEN} AS BIGINT) AS first_off,
           CAST((startpos + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT)
             AS last_seq,
           CAST((startpos + n_tokens - 1) // {PACK_SEQ_LEN}
             - startpos // {PACK_SEQ_LEN} AS BIGINT) AS crossings
    FROM plan
    """,
)
def sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING SEQUENCE PACKING plan — concatenate-and-split batch
    materialization: within each language domain, documents
    concatenate in doc_id order and split into {PACK_SEQ_LEN}-token
    windows (document splitting allowed — the zero-padding production
    variant); each document gets its window coordinates (first_seq /
    first_off / last_seq) and boundary-crossing count, which is
    exactly what a loader needs to emit packed examples and what an
    attention-masking auditor needs to price cross-document
    contamination inside windows.

    Scale: see _pack_plan — the running sum is TWO-LEVEL (per-(lang,
    bucket) windows + a bucket-grain offset frame), so no task ever
    sorts a whole domain; everything else is arithmetic on the
    prefix. The oracle states the naive single window per domain —
    the hash gate proves the distributed prefix sum equals it."""
    C = PACK_SEQ_LEN
    p = _pack_plan(spark, sf_dir)
    return p.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"startpos div {C}").alias("first_seq"),
        (F.col("startpos") % C).alias("first_off"),
        F.expr(f"(startpos + n_tokens - 1) div {C}").alias("last_seq"),
        (
            F.expr(f"(startpos + n_tokens - 1) div {C}")
            - F.expr(f"startpos div {C}")
        ).alias("crossings"),
    )


@register(
    "sequence_packing_report",
    f"""
    WITH {_PACK_PLAN_CTE}
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {PACK_SEQ_LEN} - 1) // {PACK_SEQ_LEN} AS BIGINT)
             AS n_seqs,
           CAST(SUM(CASE WHEN (startpos + n_tokens - 1) // {PACK_SEQ_LEN}
                              > startpos // {PACK_SEQ_LEN}
                         THEN 1 ELSE 0 END) AS BIGINT) AS crossing_docs,
           CAST(SUM(CASE WHEN (startpos + n_tokens - 1) // {PACK_SEQ_LEN}
                              > startpos // {PACK_SEQ_LEN}
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS cross_rate,
           CAST(({PACK_SEQ_LEN} - SUM(n_tokens) % {PACK_SEQ_LEN})
                % {PACK_SEQ_LEN} AS BIGINT) AS tail_padding
    FROM plan
    GROUP BY lang
    """,
)
def sequence_packing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency report per language domain: window count,
    how many documents straddle a window boundary (the cross-document
    attention-contamination rate the masking strategy must handle),
    and the tail padding — which under split-packing is ONLY the last
    window's remainder, the whole point of the scheme (padding-free
    interior). One aggregate over the packing plan's prefix frame.

    Scale: inherits _pack_plan's two-level prefix sum; the report
    itself is a lang-grain aggregate (bounded by the domain count)."""
    C = PACK_SEQ_LEN
    p = _pack_plan(spark, sf_dir)
    crossing = (
        F.expr(f"(startpos + n_tokens - 1) div {C}")
        > F.expr(f"startpos div {C}")
    ).cast("int")
    return (
        p.withColumn("_x", crossing)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.expr(f"CAST((sum(n_tokens) + {C} - 1) div {C} AS BIGINT)").alias(
                "n_seqs"
            ),
            F.sum("_x").cast("bigint").alias("crossing_docs"),
            (F.sum("_x").cast("double") / F.count("*")).alias("cross_rate"),
            F.expr(
                f"CAST(({C} - sum(n_tokens) % {C}) % {C} AS BIGINT)"
            ).alias("tail_padding"),
        )
    )


@register(
    "packed_sequence_manifest",
    f"""
    WITH {_PACK_PLAN_CTE},
    spans AS (
      SELECT lang, doc_id, n_tokens,
             CAST(startpos AS BIGINT) AS startpos,
             CAST(startpos // {PACK_SEQ_LEN} AS BIGINT) AS s0,
             CAST((startpos + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT) AS s1
      FROM plan
    ),
    exploded AS (
      SELECT s.lang, s.doc_id, u.seq_id,
             CASE WHEN u.seq_id > s.s0 OR u.seq_id < s.s1 THEN 1 ELSE 0 END
               AS is_fragment,
             least((u.seq_id + 1) * {PACK_SEQ_LEN},
                   s.startpos + s.n_tokens)
               - greatest(u.seq_id * {PACK_SEQ_LEN}, s.startpos) AS seq_tokens
      FROM spans s,
           LATERAL (SELECT unnest(generate_series(s.s0, s.s1)) AS seq_id) u
    )
    SELECT lang, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_fragment) AS BIGINT) AS n_fragments,
           CAST(SUM(seq_tokens) AS BIGINT) AS fill_tokens
    FROM exploded
    GROUP BY lang, seq_id
    """,
)
def packed_sequence_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEQUENCE-grain inverse of sequence_packing_plan — the
    manifest a training loader actually consumes: for every packed
    window, how many documents compose it, how many of them are
    boundary fragments (the rows an attention mask must fence), and
    the fill (== {PACK_SEQ_LEN} everywhere except each domain's tail
    window — split packing's zero-interior-padding invariant, visible
    per row). Each document explodes onto the windows it spans —
    fan-out is crossings+1, bounded by n_tokens/{PACK_SEQ_LEN}+1, so
    the exploded frame is O(total tokens / seq_len + docs), the
    manifest's own size.

    Scale: inherits the two-level prefix sum; the explode is
    token-volume-bounded (see above) and the final aggregate is
    window-grain."""
    C = PACK_SEQ_LEN
    p = _pack_plan(spark, sf_dir)
    spans = p.select(
        "lang",
        "doc_id",
        "n_tokens",
        "startpos",
        F.expr(f"startpos div {C}").alias("s0"),
        F.expr(f"(startpos + n_tokens - 1) div {C}").alias("s1"),
    )
    exploded = spans.select(
        "lang",
        "doc_id",
        "n_tokens",
        "startpos",
        "s0",
        "s1",
        F.explode(F.sequence("s0", "s1")).alias("seq_id"),
    ).select(
        "lang",
        "seq_id",
        F.when(
            (F.col("seq_id") > F.col("s0")) | (F.col("seq_id") < F.col("s1")), 1
        )
        .otherwise(0)
        .alias("is_fragment"),
        (
            F.least(
                (F.col("seq_id") + 1) * C,
                F.col("startpos") + F.col("n_tokens"),
            )
            - F.greatest(F.col("seq_id") * C, F.col("startpos"))
        ).alias("seq_tokens"),
    )
    return exploded.groupBy("lang", "seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("is_fragment").cast("bigint").alias("n_fragments"),
        F.sum("seq_tokens").cast("bigint").alias("fill_tokens"),
    )


@register(
    "sequence_packing_nosplit_plan",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang,
             CAST(length(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    base AS (
      SELECT doc_id, lang, n_tokens,
             CAST(doc_id // {PACK_BUCKET} AS BIGINT) AS bucket,
             least(n_tokens, {PACK_SEQ_LEN}) AS n_eff,
             row_number() OVER (PARTITION BY lang, doc_id // {PACK_BUCKET}
                                ORDER BY doc_id) AS rn
      FROM toks WHERE n_tokens > 0
    ),
    rec AS (
      SELECT lang, bucket, rn, doc_id, n_tokens, n_eff,
             CAST(0 AS BIGINT) AS win_local, CAST(0 AS BIGINT) AS "offset",
             n_eff AS fill
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.lang, b.bucket, b.rn, b.doc_id, b.n_tokens, b.n_eff,
             CASE WHEN r.fill + b.n_eff > {PACK_SEQ_LEN}
                  THEN r.win_local + 1 ELSE r.win_local END,
             CASE WHEN r.fill + b.n_eff > {PACK_SEQ_LEN}
                  THEN CAST(0 AS BIGINT) ELSE r.fill END,
             CASE WHEN r.fill + b.n_eff > {PACK_SEQ_LEN}
                  THEN b.n_eff ELSE r.fill + b.n_eff END
      FROM rec r
      JOIN base b ON b.lang = r.lang AND b.bucket = r.bucket
                 AND b.rn = r.rn + 1
    )
    SELECT doc_id, lang, bucket, win_local, "offset", n_eff,
           CAST(CASE WHEN n_tokens > {PACK_SEQ_LEN} THEN 1 ELSE 0 END AS INT)
             AS truncated
    FROM rec
    """,
)
def sequence_packing_nosplit_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-SPLIT sequence packing — the attention-clean complement of
    sequence_packing_plan: documents never straddle a window (a doc
    that doesn't fit starts the next one; docs over {PACK_SEQ_LEN}
    tokens truncate, flagged), trading bounded padding for ZERO
    cross-document fragments. Pure next-fit is an inherently
    sequential recurrence, so the scalable form is BLOCK-ALIGNED
    next-fit: windows never span a {PACK_BUCKET}-doc id bucket, making
    every (lang, bucket) group independent — each is a BOUNDED
    sequential fold (≤ {PACK_BUCKET} docs) inside one Arrow kernel,
    embarrassingly parallel across buckets, at the cost of at most one
    extra partial window per bucket vs the sequential ideal. This is
    the parallel-loader production shape: alignment is what lets a
    thousand workers pack independently. The oracle states the same
    recurrence as a recursive CTE stepping rank-within-bucket — the
    hash gate proves kernel fold == recurrence.

    Scale: one tokenize pass + one shuffle to (lang, bucket) groups of
    ≤ {PACK_BUCKET} rows; no window over more than a bucket; no
    global state at all (buckets are self-aligned)."""
    from pyspark.sql import types as T

    C = PACK_SEQ_LEN
    d = table(spark, sf_dir, "documents")
    toks = _pack_tokens(d).withColumn(
        "bucket", F.expr(f"doc_id div {PACK_BUCKET}").cast("bigint")
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("win_local", T.LongType()),
            T.StructField("offset", T.LongType()),
            T.StructField("n_eff", T.LongType()),
            T.StructField("truncated", T.IntegerType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        win, fill = 0, 0
        wins, offs, effs, truncs = [], [], [], []
        for n in pdf["n_tokens"]:
            n_eff = min(int(n), C)
            if fill + n_eff > C and fill > 0:
                win += 1
                fill = 0
            wins.append(win)
            offs.append(fill)
            effs.append(n_eff)
            truncs.append(1 if int(n) > C else 0)
            fill += n_eff
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "bucket": pdf["bucket"],
                "win_local": wins,
                "offset": offs,
                "n_eff": effs,
                "truncated": truncs,
            }
        )

    return toks.groupBy("lang", "bucket").applyInPandas(pack, schema=schema)


PACK_FRAG_BUDGET = 6  # max document fragments per training window

_BUDGET_PLAN_CTES = f"""toks AS (
      SELECT doc_id, lang,
             CAST(length(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    base AS (
      SELECT doc_id, lang, n_tokens,
             CAST(doc_id // {PACK_BUCKET} AS BIGINT) AS bucket,
             row_number() OVER (PARTITION BY lang, doc_id // {PACK_BUCKET}
                                ORDER BY doc_id) AS rn
      FROM toks WHERE n_tokens > 0
    ),
    rec AS (
      SELECT lang, bucket, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS start_p,
             CAST(0 AS BIGINT) AS pad_before,
             n_tokens AS end_p,
             CAST(CASE WHEN n_tokens % {PACK_SEQ_LEN} = 0 THEN 0
                       WHEN n_tokens // {PACK_SEQ_LEN} > 0 THEN 1
                       ELSE 1 END AS BIGINT) AS frags
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.lang, b.bucket, b.rn, b.doc_id, b.n_tokens,
             p.place_p,
             p.place_p - r.end_p,
             p.place_p + b.n_tokens,
             CASE WHEN (p.place_p + b.n_tokens) % {PACK_SEQ_LEN} = 0
                    THEN CAST(0 AS BIGINT)
                  WHEN (p.place_p + b.n_tokens) // {PACK_SEQ_LEN}
                       > p.place_p // {PACK_SEQ_LEN}
                    THEN CAST(1 AS BIGINT)
                  ELSE (CASE WHEN p.place_p % {PACK_SEQ_LEN} = 0
                             THEN 0 ELSE r.frags END) + 1 END
      FROM rec r
      JOIN base b ON b.lang = r.lang AND b.bucket = r.bucket
                 AND b.rn = r.rn + 1
      CROSS JOIN LATERAL (SELECT CASE
             WHEN r.frags >= {PACK_FRAG_BUDGET}
                  AND r.end_p % {PACK_SEQ_LEN} > 0
             THEN (r.end_p // {PACK_SEQ_LEN} + 1) * {PACK_SEQ_LEN}
             ELSE r.end_p END AS place_p) p
    )"""


@register(
    "sequence_packing_budget_plan",
    f"""
    WITH RECURSIVE {_BUDGET_PLAN_CTES}
    SELECT doc_id, lang, bucket, n_tokens,
           CAST(start_p // {PACK_SEQ_LEN} AS BIGINT) AS first_seq,
           CAST(start_p % {PACK_SEQ_LEN} AS BIGINT) AS first_off,
           CAST((start_p + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT)
             AS last_seq,
           CAST(pad_before AS BIGINT) AS pad_before
    FROM rec
    """,
)
def sequence_packing_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAGMENT-BUDGETED split packing — the quality-sensitive trainer
    mode between sequence_packing_plan (zero padding, unbounded
    fragments per window) and the no-split plan (zero fragments,
    unbounded padding): documents still concatenate and split across
    {PACK_SEQ_LEN}-token windows, but a window may hold at most
    {PACK_FRAG_BUDGET} document fragments — once a window reaches the
    budget, the rest of it pads out and the next document starts at the
    next window boundary (bounding the attention-mask segment count per
    window, which is what makes block-diagonal masking kernels cheap).
    Each document reports its placement (first_seq / first_off /
    last_seq, window ids bucket-local) and the padding injected ahead
    of it by a budget trip.

    The recurrence is order-dependent (a doc's position depends on how
    many fragments its predecessors stacked into the current window),
    so like the no-split plan it is BLOCK-ALIGNED: windows never span a
    {PACK_BUCKET}-doc id bucket, every (lang, bucket) group is an
    independent bounded fold (≤ {PACK_BUCKET} docs) in one Arrow
    kernel, embarrassingly parallel across buckets. The oracle states
    the same recurrence as a recursive CTE stepping rank-within-bucket
    — the hash gate proves kernel fold == recurrence.

    Scale: one tokenize pass + one shuffle into (lang, bucket) groups;
    no window functions over more than a bucket; no global state.
    Reference scope: batch preparation downstream of the loader's
    ingest path (SURVEY §2 extension family; no reference analog —
    cited as the packing family's third mode)."""
    d = table(spark, sf_dir, "documents")
    toks = _pack_tokens(d).withColumn(
        "bucket", F.expr(f"doc_id div {PACK_BUCKET}").cast("bigint")
    )
    return _budget_pack_fold(toks)


def _budget_pack_fold(toks: DataFrame, with_state: bool = False) -> DataFrame:
    """The fragment-budget next-fit fold over a (doc_id, lang, bucket,
    n_tokens) frame (see sequence_packing_budget_plan); factored so the
    property suite can drive the identical recurrence on arbitrary
    token frames, and so the incremental store can seed each (lang,
    bucket) group's state: optional `init_end_p` / `init_frags` columns
    (constant within a group) start the fold mid-bucket — absent, the
    fold starts fresh, exactly the batch plan. With ``with_state`` the
    output carries the group's FINAL (end_p, frags) on every row —
    what the store persists to continue a boundary bucket next epoch."""
    from pyspark.sql import types as T

    C = PACK_SEQ_LEN
    B = PACK_FRAG_BUDGET

    fields = [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("first_off", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("pad_before", T.LongType()),
    ]
    if with_state:
        fields += [
            T.StructField("fin_end_p", T.LongType()),
            T.StructField("fin_frags", T.LongType()),
        ]
    schema = T.StructType(fields)

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        end_p = int(pdf["init_end_p"].iloc[0]) if "init_end_p" in pdf.columns else 0
        frags = int(pdf["init_frags"].iloc[0]) if "init_frags" in pdf.columns else 0
        fseq, foff, lseq, pads = [], [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if frags >= B and end_p % C > 0:
                place = (end_p // C + 1) * C
            else:
                place = end_p
            fseq.append(place // C)
            foff.append(place % C)
            lseq.append((place + n - 1) // C)
            pads.append(place - end_p)
            new_end = place + n
            if new_end % C == 0:
                frags = 0
            elif new_end // C > place // C:
                frags = 1
            else:
                frags = (0 if place % C == 0 else frags) + 1
            end_p = new_end
        out = {
            "doc_id": pdf["doc_id"],
            "lang": pdf["lang"],
            "bucket": pdf["bucket"],
            "n_tokens": pdf["n_tokens"],
            "first_seq": fseq,
            "first_off": foff,
            "last_seq": lseq,
            "pad_before": pads,
        }
        if with_state:
            out["fin_end_p"] = [end_p] * len(pdf)
            out["fin_frags"] = [frags] * len(pdf)
        return pd.DataFrame(out)

    return toks.groupBy("lang", "bucket").applyInPandas(pack, schema=schema)


@register(
    "packed_budget_manifest",
    f"""
    WITH RECURSIVE {_BUDGET_PLAN_CTES},
    spans AS (
      SELECT lang, bucket, doc_id, n_tokens,
             CAST(start_p AS BIGINT) AS start_p,
             CAST(start_p // {PACK_SEQ_LEN} AS BIGINT) AS s0,
             CAST((start_p + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT) AS s1
      FROM rec
    ),
    exploded AS (
      SELECT s.lang, s.bucket, s.doc_id, u.seq_id,
             CASE WHEN u.seq_id > s.s0 OR u.seq_id < s.s1 THEN 1 ELSE 0 END
               AS is_fragment,
             least((u.seq_id + 1) * {PACK_SEQ_LEN},
                   s.start_p + s.n_tokens)
               - greatest(u.seq_id * {PACK_SEQ_LEN}, s.start_p) AS seq_tokens
      FROM spans s,
           LATERAL (SELECT unnest(generate_series(s.s0, s.s1)) AS seq_id) u
    )
    SELECT lang, bucket, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_fragment) AS BIGINT) AS n_fragments,
           CAST(SUM(seq_tokens) AS BIGINT) AS fill_tokens,
           CAST({PACK_SEQ_LEN} - SUM(seq_tokens) AS BIGINT) AS pad_tokens
    FROM exploded
    GROUP BY lang, bucket, seq_id
    """,
)
def packed_budget_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WINDOW-grain inverse of sequence_packing_budget_plan — what
    the loader consumes under the fragment budget: per packed window
    its document count, fragment count (provably ≤ {PACK_FRAG_BUDGET}
    by the budget invariant — visible per row), fill, and padding.
    Unlike split packing's manifest (padding only in each domain's tail
    window), budget padding appears mid-stream wherever a window hit
    the fragment cap — pad_tokens is exactly the attention-efficiency
    price of the bounded mask segment count, per window.

    Scale: inherits the block-aligned budget fold; each document
    explodes onto the windows it spans (fan-out crossings+1, bounded by
    n_tokens/{PACK_SEQ_LEN}+1), so the exploded frame is O(total
    tokens / seq_len + docs); the final aggregate is window-grain."""
    C = PACK_SEQ_LEN
    d = table(spark, sf_dir, "documents")
    toks = _pack_tokens(d).withColumn(
        "bucket", F.expr(f"doc_id div {PACK_BUCKET}").cast("bigint")
    )
    p = _budget_pack_fold(toks).withColumn(
        "start_p", F.col("first_seq") * C + F.col("first_off")
    )
    exploded = p.select(
        "lang",
        "bucket",
        "n_tokens",
        "start_p",
        F.col("first_seq").alias("s0"),
        F.col("last_seq").alias("s1"),
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    ).select(
        "lang",
        "bucket",
        "seq_id",
        F.when(
            (F.col("seq_id") > F.col("s0")) | (F.col("seq_id") < F.col("s1")), 1
        )
        .otherwise(0)
        .alias("is_fragment"),
        (
            F.least(
                (F.col("seq_id") + 1) * C,
                F.col("start_p") + F.col("n_tokens"),
            )
            - F.greatest(F.col("seq_id") * C, F.col("start_p"))
        ).alias("seq_tokens"),
    )
    return exploded.groupBy("lang", "bucket", "seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("is_fragment").cast("bigint").alias("n_fragments"),
        F.sum("seq_tokens").cast("bigint").alias("fill_tokens"),
        (C - F.sum("seq_tokens")).cast("bigint").alias("pad_tokens"),
    )


@register(
    "packing_mask_density_report",
    f"""
    WITH RECURSIVE {_BUDGET_PLAN_CTES},
    spans AS (
      SELECT lang, bucket, doc_id, n_tokens,
             CAST(start_p AS BIGINT) AS start_p,
             CAST(start_p // {PACK_SEQ_LEN} AS BIGINT) AS s0,
             CAST((start_p + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT) AS s1
      FROM rec
    ),
    exploded AS (
      SELECT s.lang, s.bucket, u.seq_id,
             least((u.seq_id + 1) * {PACK_SEQ_LEN},
                   s.start_p + s.n_tokens)
               - greatest(u.seq_id * {PACK_SEQ_LEN}, s.start_p) AS seq_tokens
      FROM spans s,
           LATERAL (SELECT unnest(generate_series(s.s0, s.s1)) AS seq_id) u
    ),
    win AS (
      SELECT lang, bucket, seq_id,
             CAST(COUNT(*) AS BIGINT) AS n_frags,
             CAST(SUM(seq_tokens) AS BIGINT) AS fill,
             CAST(SUM(seq_tokens * seq_tokens) AS BIGINT) AS sq
      FROM exploded GROUP BY lang, bucket, seq_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(n_frags) AS BIGINT) AS n_fragments,
           CAST(SUM(sq * 1000000 // {PACK_SEQ_LEN * PACK_SEQ_LEN})
                // COUNT(*) AS BIGINT) AS mean_density_ppm,
           CAST(SUM(fill * 1000000 // {PACK_SEQ_LEN})
                // COUNT(*) AS BIGINT) AS mean_fill_ppm
    FROM win
    GROUP BY lang
    """,
)
def packing_mask_density_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATTENTION-MASK efficiency audit of the fragment-budgeted packing:
    under block-diagonal (document-fenced) masking, a window whose fill
    splits into fragments of lengths f_i admits Σ f_i² of its
    {PACK_SEQ_LEN}² attention pairs — this report prices that per
    language domain: window count, fragment count, mean mask density
    (Σ f_i² / C² per window, ppm) and mean fill (padding's complement).
    Density is exactly what the budget buys: fewer, larger fragments
    per window raise Σ f_i² at the price of the padding mean_fill_ppm
    exposes — the two columns are the tradeoff, per domain, in one
    scan. Per-window ratios quantize FIRST (integer ppm per window,
    every intermediate < 2⁶³ at any corpus size), then average — the
    established two-step floor, identical in both engines.

    Scale: inherits the block-aligned fold; the explode is
    token-volume-bounded (crossings+1 per doc); both aggregates are
    window- then domain-grain."""
    C = PACK_SEQ_LEN
    d = table(spark, sf_dir, "documents")
    toks = _pack_tokens(d).withColumn(
        "bucket", F.expr(f"doc_id div {PACK_BUCKET}").cast("bigint")
    )
    p = _budget_pack_fold(toks).withColumn(
        "start_p", F.col("first_seq") * C + F.col("first_off")
    )
    exploded = p.select(
        "lang",
        "bucket",
        "n_tokens",
        "start_p",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    ).select(
        "lang",
        "bucket",
        "seq_id",
        (
            F.least(
                (F.col("seq_id") + 1) * C,
                F.col("start_p") + F.col("n_tokens"),
            )
            - F.greatest(F.col("seq_id") * C, F.col("start_p"))
        ).alias("seq_tokens"),
    )
    win = exploded.groupBy("lang", "bucket", "seq_id").agg(
        F.count("*").cast("bigint").alias("n_frags"),
        F.sum("seq_tokens").cast("bigint").alias("fill"),
        F.sum(F.col("seq_tokens") * F.col("seq_tokens"))
        .cast("bigint")
        .alias("sq"),
    )
    return win.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.sum("n_frags").cast("bigint").alias("n_fragments"),
        F.expr(f"sum(sq * 1000000 div {C * C}) div count(*)")
        .cast("bigint")
        .alias("mean_density_ppm"),
        F.expr(f"sum(fill * 1000000 div {C}) div count(*)")
        .cast("bigint")
        .alias("mean_fill_ppm"),
    )


BUDGET_MULT = 3  # total training-token budget = 3x the corpus
BUDGET_MAX_EPOCHS = 4  # per-domain repetition cap (data-constrained scaling)


@register(
    "data_budget_allocation",
    f"""
    WITH sizes AS (
      SELECT lang,
             CAST(SUM(CAST(length(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST({BUDGET_MULT} * SUM(n_tokens) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM sizes
    ),
    r0 AS (
      SELECT s.lang, s.n_tokens,
             CAST({BUDGET_MAX_EPOCHS} * s.n_tokens AS BIGINT) AS cap,
             least(CAST({BUDGET_MAX_EPOCHS} * s.n_tokens AS BIGINT),
                   tot.t // tot.k) AS a
      FROM sizes s CROSS JOIN tot
    ),
    t1 AS (
      SELECT CAST((SELECT t FROM tot)
               - COALESCE(SUM(CASE WHEN a >= cap THEN cap END), 0) AS BIGINT)
               AS t,
             CAST(COALESCE(SUM(CASE WHEN a < cap THEN 1 END), 0) AS BIGINT)
               AS k
      FROM r0
    ),
    r1 AS (
      SELECT r.lang, r.n_tokens, r.cap,
             CASE WHEN r.a >= r.cap THEN r.cap
                  WHEN t1.k > 0 THEN least(r.cap, t1.t // t1.k)
                  ELSE r.a END AS a
      FROM r0 r CROSS JOIN t1
    ),
    t2 AS (
      SELECT CAST((SELECT t FROM tot)
               - COALESCE(SUM(CASE WHEN a >= cap THEN cap END), 0) AS BIGINT)
               AS t,
             CAST(COALESCE(SUM(CASE WHEN a < cap THEN 1 END), 0) AS BIGINT)
               AS k
      FROM r1
    ),
    r2 AS (
      SELECT r.lang, r.n_tokens, r.cap,
             CASE WHEN r.a >= r.cap THEN r.cap
                  WHEN t2.k > 0 THEN least(r.cap, t2.t // t2.k)
                  ELSE r.a END AS a
      FROM r1 r CROSS JOIN t2
    )
    SELECT lang, n_tokens, cap AS cap_tokens, CAST(a AS BIGINT) AS alloc_tokens,
           CAST(a * 1000 // n_tokens AS BIGINT) AS epochs_milli,
           CAST(CASE WHEN a >= cap THEN 1 ELSE 0 END AS INT) AS capped
    FROM r2
    """,
)
def data_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-CONSTRAINED training budget allocation (the
    epochs-per-domain planning step of Muennighoff et al. 2023's
    setting): given a total token budget of {BUDGET_MULT}x the corpus
    and a per-domain repetition cap of {BUDGET_MAX_EPOCHS} epochs,
    allocate tokens by MAX-MIN-FAIR WATERFILLING — equal shares,
    domains that hit their cap leave the pool, their surplus
    redistributes equally among the rest (two unrolled rounds; the
    fixture exercises both the capped and redistribution branches).
    Output per domain: its cap, its allocation, the resulting epoch
    count (milli-epochs — a·1000//n stays < 2^63 at any corpus size),
    and the capped flag. Every step is BIGINT arithmetic — no float
    shares, no reduction-order ambiguity.

    Scale: one tokenize pass collapses to |languages| rows; everything
    after is arithmetic on that tiny frame (broadcast scalars), so the
    allocator costs one corpus scan regardless of rounds."""
    toks = _pack_tokens(table(spark, sf_dir, "documents"))
    sizes = toks.groupBy("lang").agg(
        F.sum("n_tokens").cast("bigint").alias("n_tokens")
    )
    return _waterfill(sizes)


def _waterfill(sizes: DataFrame) -> DataFrame:
    """Max-min-fair waterfilling epilogue over a (lang, n_tokens)
    frame — the arithmetic half of data_budget_allocation, shared by
    the batch allocator and the store-served monitor
    (streaming.stream_queries.stream_data_budget_allocation), which
    feeds it the packing store's per-language totals instead of a
    fresh tokenize pass."""
    C = BUDGET_MAX_EPOCHS
    tot = sizes.agg(
        (F.lit(BUDGET_MULT) * F.sum("n_tokens")).cast("bigint").alias("t"),
        F.count("*").cast("bigint").alias("k"),
    )
    r = (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("cap", (F.lit(C) * F.col("n_tokens")).cast("bigint"))
        .withColumn("a", F.least(F.col("cap"), F.expr("t div k")))
        .select("lang", "n_tokens", "cap", "a", "t")
    )
    for _ in range(2):
        tr = r.agg(
            (
                F.first("t")
                - F.coalesce(
                    F.sum(F.when(F.col("a") >= F.col("cap"), F.col("cap"))),
                    F.lit(0),
                )
            )
            .cast("bigint")
            .alias("tr"),
            F.coalesce(
                F.sum(F.when(F.col("a") < F.col("cap"), 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("kr"),
        )
        r = (
            r.crossJoin(F.broadcast(tr))
            .withColumn(
                "a",
                F.when(F.col("a") >= F.col("cap"), F.col("cap"))
                .when(
                    F.col("kr") > 0,
                    F.least(F.col("cap"), F.expr("tr div kr")),
                )
                .otherwise(F.col("a")),
            )
            .select("lang", "n_tokens", "cap", "a", "t")
        )
    return r.select(
        "lang",
        "n_tokens",
        F.col("cap").alias("cap_tokens"),
        F.col("a").cast("bigint").alias("alloc_tokens"),
        F.expr("a * 1000 div n_tokens").cast("bigint").alias("epochs_milli"),
        F.when(F.col("a") >= F.col("cap"), 1).otherwise(0).cast("int").alias("capped"),
    )


WARMUP_K = 40  # windows served to the curriculum warmup stage

# The quality-scored fragment-budget WINDOW frame (lang, bucket, seq_id,
# n_frags, fill_tokens, window_quality_q) — the shared front half of
# curriculum_warmup_windows (global top-K) and
# curriculum_budget_selection (per-language token-budget prefix).
_WARMUP_WIN_CTES = rf"""ql AS (
      SELECT doc_id,
             CAST(floor((
               (CAST(length(regexp_extract_all(lower(text),
                     '\b(the|and|of|to|a|in|is)\b')) AS DOUBLE) /
                greatest(length(regexp_extract_all(text, '\S+')), 1)) * 2.0
               - (CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                  / length(text)) * 3.0
               + (CASE WHEN greatest(length(regexp_extract_all(text, '\S+')), 1)
                       BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
             ) * 1000000) AS BIGINT) AS ql
      FROM documents
    ),
    spans AS (
      SELECT r.lang, r.bucket, r.doc_id, r.n_tokens, q.ql,
             CAST(r.start_p AS BIGINT) AS start_p,
             CAST(r.start_p // {PACK_SEQ_LEN} AS BIGINT) AS s0,
             CAST((r.start_p + r.n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT) AS s1
      FROM rec r JOIN ql q ON q.doc_id = r.doc_id
    ),
    exploded AS (
      SELECT s.lang, s.bucket, u.seq_id, s.ql,
             least((u.seq_id + 1) * {PACK_SEQ_LEN},
                   s.start_p + s.n_tokens)
               - greatest(u.seq_id * {PACK_SEQ_LEN}, s.start_p) AS seq_tokens
      FROM spans s,
           LATERAL (SELECT unnest(generate_series(s.s0, s.s1)) AS seq_id) u
    ),
    win AS (
      SELECT lang, bucket, CAST(seq_id AS BIGINT) AS seq_id,
             CAST(COUNT(*) AS BIGINT) AS n_frags,
             CAST(SUM(seq_tokens) AS BIGINT) AS fill_tokens,
             CAST(SUM(ql * seq_tokens) // SUM(seq_tokens) AS BIGINT)
               AS window_quality_q
      FROM exploded GROUP BY lang, bucket, seq_id
    )"""


@register(
    "curriculum_warmup_windows",
    rf"""
    WITH RECURSIVE {_BUDGET_PLAN_CTES},
    {_WARMUP_WIN_CTES}
    SELECT lang, bucket, seq_id, n_frags, fill_tokens, window_quality_q,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY window_quality_q DESC,
                                   lang ASC, bucket ASC, seq_id ASC) AS rank
      FROM win
    ) WHERE rank <= {WARMUP_K}
    """,
)
def curriculum_warmup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM composition over the packed batches — the
    quality-first warmup stage some trainers run before the uniform
    pass: every fragment-budgeted window scored by the TOKEN-WEIGHTED
    mean quality of the documents composing it (per-doc floor(q·1e6)
    BIGINT, Σ ql·tokens // Σ tokens — two-step integer, exact), and
    the top-{WARMUP_K} cleanest windows ranked for the warmup batch.
    Composes three standing pieces (budget fold, window explode,
    quality scorer) into the loader-facing curriculum artifact.

    Scale: one tokenize + one quality pass over documents, the
    token-bounded explode, a window-grain aggregate, and a TakeOrdered
    global top-k — no global sort, no window over more than a bucket."""
    win = _warmup_window_frame(spark, sf_dir)
    order = [
        F.col("window_quality_q").desc(),
        F.col("lang").asc(),
        F.col("bucket").asc(),
        F.col("seq_id").asc(),
    ]
    top = win.orderBy(*order).limit(WARMUP_K)
    w = W.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "lang", "bucket", "seq_id", "n_frags", "fill_tokens",
        "window_quality_q", "rank",
    )


def _warmup_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-scored fragment-budget window frame (lang, bucket,
    seq_id, n_frags, fill_tokens, window_quality_q) — Spark twin of
    _WARMUP_WIN_CTES, shared by curriculum_warmup_windows and
    curriculum_budget_selection."""
    C = PACK_SEQ_LEN
    d = table(spark, sf_dir, "documents")
    toks = _pack_tokens(d).withColumn(
        "bucket", F.expr(f"doc_id div {PACK_BUCKET}").cast("bigint")
    )
    ql = _quality_of(d).select(
        "doc_id",
        F.floor(F.col("quality_score") * 1000000.0).cast("bigint").alias("ql"),
    )
    p = (
        _budget_pack_fold(toks)
        .withColumn("start_p", F.col("first_seq") * C + F.col("first_off"))
        .join(ql, "doc_id")
    )
    exploded = p.select(
        "lang",
        "bucket",
        "ql",
        "n_tokens",
        "start_p",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    ).select(
        "lang",
        "bucket",
        "seq_id",
        "ql",
        (
            F.least(
                (F.col("seq_id") + 1) * C,
                F.col("start_p") + F.col("n_tokens"),
            )
            - F.greatest(F.col("seq_id") * C, F.col("start_p"))
        ).alias("seq_tokens"),
    )
    return exploded.groupBy("lang", "bucket", "seq_id").agg(
        F.count("*").cast("bigint").alias("n_frags"),
        F.sum("seq_tokens").cast("bigint").alias("fill_tokens"),
        # Exact integer FLOOR division to match DuckDB's `//` (Spark's
        # `div` truncates toward zero, which diverges by 1 when the
        # weighted-quality sum is negative — possible for punct-heavy
        # docs via the -3.0 term). pmod makes the numerator exactly
        # divisible, so the final `div` is exact (floor == truncate).
        F.expr(
            "(sum(ql * seq_tokens)"
            " - pmod(sum(ql * seq_tokens), sum(seq_tokens)))"
            " div sum(seq_tokens)"
        )
        .cast("bigint")
        .alias("window_quality_q"),
    )


SEL_QBAND = 10_000  # ppm of window quality per selection band
WARMUP_FRAC_DIV = 2  # warmup stage draws alloc_tokens/this per language


def _budget_selection_oracle() -> str:
    from ..plans.registry import QUERIES as _REG

    alloc = _REG["data_budget_allocation"].oracle
    return rf"""
    WITH RECURSIVE {_BUDGET_PLAN_CTES},
    {_WARMUP_WIN_CTES},
    alloc AS ({alloc}),
    sel AS (
      SELECT w.lang, w.bucket, w.seq_id, w.n_frags, w.fill_tokens,
             w.window_quality_q,
             CAST(a.alloc_tokens // {WARMUP_FRAC_DIV} AS BIGINT)
               AS warmup_tokens,
             SUM(w.fill_tokens) OVER (
               PARTITION BY w.lang
               ORDER BY w.window_quality_q DESC, w.bucket ASC, w.seq_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM win w JOIN alloc a USING (lang)
    )
    SELECT lang, bucket, seq_id, n_frags, fill_tokens, window_quality_q,
           warmup_tokens,
           CAST(CASE WHEN cum > warmup_tokens THEN 1 ELSE 0 END AS INT)
             AS straddles
    FROM sel WHERE cum - fill_tokens < warmup_tokens
    """


@register("curriculum_budget_selection", _budget_selection_oracle)
def curriculum_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARMUP BATCHES UNDER THE BUDGET CAPS — the composition
    data_budget_allocation and curriculum_warmup_windows exist to
    serve: per language, packed training windows are drawn in QUALITY
    order (best first) until the language's max-min-fair token
    allocation is exhausted — the production warmup plan for a
    data-constrained run. The warmup stage draws HALF of each
    language's allocation (warmup_tokens = alloc_tokens // 
    {WARMUP_FRAC_DIV}) — the high-quality opening fraction before the
    uniform pass: a window is taken while the tokens drawn before it
    are strictly under warmup_tokens, and the window that crosses the
    cap is taken and flagged `straddles`. Languages whose half-
    allocation still exceeds their corpus select every window — the
    fixture exercises both the full-selection and strict-prefix
    branches (and the straddle flag) at sf0.001 and sf0.01.

    Scale: the oracle's naive form is a per-language running sum over
    EVERY window — a one-task-per-language funnel at corpus scale. The
    Spark plan is BANDED (the dsir_topk_scalable pattern): windows
    group into {SEL_QBAND}-ppm quality bands; per-(lang, band) token
    totals (a tiny frame) locate each language's threshold band via a
    band-grain running sum; bands above it select whole, bands below
    drop, and only the ONE straddling band per language ranks
    window-grain (its partition is band-sized, not corpus-sized).
    Banding by truncating division is order-consistent with the
    quality sort, so banded selection == the oracle's naive prefix."""
    win = _warmup_window_frame(spark, sf_dir)
    toks = _pack_tokens(table(spark, sf_dir, "documents"))
    sizes = toks.groupBy("lang").agg(
        F.sum("n_tokens").cast("bigint").alias("n_tokens")
    )
    alloc = _waterfill(sizes).select(
        "lang",
        F.expr(f"alloc_tokens div {WARMUP_FRAC_DIV}")
        .cast("bigint")
        .alias("warmup_tokens"),
    )

    wb = win.withColumn(
        "band", F.expr(f"window_quality_q div {SEL_QBAND}").cast("bigint")
    )
    bands = wb.groupBy("lang", "band").agg(
        F.sum("fill_tokens").cast("bigint").alias("bt")
    )
    wband = W.partitionBy("lang").orderBy(F.col("band").desc())
    # r18 NOTE (measured rejection): this plan evaluates the window
    # frame 3x (the band aggregate and the picked join) — 44 parquet
    # scans — but BOTH checkpoint variants (the window frame itself;
    # just this tiny band frame) measured consistent LOSSES at sf0.1
    # (warm 2.9-3.7 s -> 3.7-6.8 s): the re-evaluations execute as
    # concurrent stages inside the one action, while eager checkpoints
    # serialize the pipeline into sequential jobs.
    bands = (
        bands.withColumn(
            "cum_bt", F.sum("bt").over(wband).cast("bigint")
        )
        .withColumn("base", (F.col("cum_bt") - F.col("bt")).cast("bigint"))
        .join(F.broadcast(alloc), "lang")
    )
    # Whole bands strictly inside the budget; the one straddling band
    # per language; everything else drops before any window-grain work.
    full = bands.filter(F.col("cum_bt") <= F.col("warmup_tokens")).select(
        "lang", "band", "base", "warmup_tokens", F.lit(1).alias("whole")
    )
    edge = bands.filter(
        (F.col("base") < F.col("warmup_tokens"))
        & (F.col("cum_bt") > F.col("warmup_tokens"))
    ).select("lang", "band", "base", "warmup_tokens", F.lit(0).alias("whole"))
    picked = wb.join(full.unionByName(edge), ["lang", "band"])
    wsel = W.partitionBy("lang", "band").orderBy(
        F.col("window_quality_q").desc(), F.col("bucket").asc(),
        F.col("seq_id").asc(),
    )
    sel = picked.withColumn(
        "cum",
        (F.col("base") + F.sum("fill_tokens").over(wsel)).cast("bigint"),
    ).filter(
        (F.col("whole") == 1)
        | (F.col("cum") - F.col("fill_tokens") < F.col("warmup_tokens"))
    )
    return sel.select(
        "lang", "bucket", "seq_id", "n_frags", "fill_tokens",
        "window_quality_q",
        F.col("warmup_tokens").cast("bigint").alias("warmup_tokens"),
        F.when(F.col("cum") > F.col("warmup_tokens"), 1)
        .otherwise(0)
        .cast("int")
        .alias("straddles"),
    )


@register(
    "langid_confusion",
    f"""
    WITH base AS ({_LANGID_ORACLE}),
    cells AS (
      SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY labeled_lang, predicted_lang
    )
    SELECT labeled_lang, predicted_lang, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY labeled_lang)
                AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN labeled_lang = predicted_lang THEN 1 ELSE 0 END
                AS INT) AS is_correct
    FROM cells
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFUSION MATRIX for the language-ID heuristic — the evaluation
    query that turns langid_heuristic's per-document predictions into
    the per-label quality picture (which languages it confuses with
    which, per-label recall in ppm). The statistic frame is
    |labels|x|labels| cells, so the normalizing window reads a
    bounded frame however large the corpus.

    Scale: one map-only scoring pass (langid's plan) + a
    map-side-combined cell aggregate; nothing downstream sees more
    than the label vocabulary squared."""
    pred = langid_heuristic(spark, sf_dir)
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return cells.select(
        "labeled_lang",
        "predicted_lang",
        "n",
        F.expr(
            "CAST(n * 1000000 div SUM(n) OVER (PARTITION BY labeled_lang)"
            " AS BIGINT)"
        ).alias("recall_ppm"),
        F.when(F.col("labeled_lang") == F.col("predicted_lang"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_correct"),
    )


ZIPF_K = 100  # head tokens fitted
ZIPF_QZ = 1000  # milli-nat quantization (keeps the OLS sums < 2^63)


@register(
    "zipf_slope_tokens",
    rf"""
    WITH toks AS (
      SELECT u.token
      FROM (SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    freq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS f
      FROM toks GROUP BY token
    ),
    head AS (
      SELECT token, f,
             row_number() OVER (ORDER BY f DESC, token ASC) AS r
      FROM freq
      ORDER BY f DESC, token ASC LIMIT {ZIPF_K}
    ),
    pts AS (
      SELECT CAST(floor(ln(r) * {ZIPF_QZ}) AS BIGINT) AS x,
             CAST(floor(ln(f) * {ZIPF_QZ}) AS BIGINT) AS y
      FROM head
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT k AS k_tokens,
           CAST((sx * sy - k * sxy) // (k * sxx - sx * sx) AS BIGINT)
             AS zipf_exponent_int,
           CAST(((sx * sy - k * sxy) % (k * sxx - sx * sx)) * 1000000
                // (k * sxx - sx * sx) AS BIGINT) AS zipf_exponent_frac_ppm
    FROM s
    """,
)
def zipf_slope_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF EXPONENT of the token frequency head — the corpus-shape
    statistic next to lexical_entropy and vocab_growth_curve: ordinary
    least squares of ln(freq) on ln(rank) over the top-{ZIPF_K}
    tokens, reported as the POSITIVE exponent s in freq ∝ rank^(−s)
    (natural text sits near 1; synthetic or de-duplicated corpora
    drift). Both logarithms quantize per term (floor(ln·{ZIPF_QZ})
    BIGINT — milli-nats keep every OLS sum < 2⁶³ at any corpus size),
    the negated slope splits into an integer part and a POSITIVE
    remainder scaled to ppm (both operands positive, so `div`'s
    truncation and `//`'s floor agree — the negative-division
    semantics difference between the engines never arises).

    Scale: one tokenize pass to token-grain counts (map-side
    combined), a TakeOrdered top-{ZIPF_K} head, and closed-form OLS
    over {ZIPF_K} rows — the fit costs one corpus scan."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(norm_text("text"), " ")).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("f"))
    return _zipf_epilogue(freq)


def _zipf_epilogue(freq: DataFrame) -> DataFrame:
    """OLS Zipf fit over a (token, f) frequency frame — shared by the
    batch zipf_slope_tokens and the token-store-served
    stream_zipf_slope (streaming.stream_queries)."""
    from pyspark.sql.window import Window as W

    QZ = ZIPF_QZ
    head = freq.orderBy(F.col("f").desc(), F.col("token").asc()).limit(ZIPF_K)
    w = W.orderBy(F.col("f").desc(), F.col("token").asc())
    pts = head.withColumn("r", F.row_number().over(w)).select(
        F.floor(F.log(F.col("r").cast("double")) * QZ).cast("bigint").alias("x"),
        F.floor(F.log(F.col("f").cast("double")) * QZ).cast("bigint").alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return s.select(
        F.col("k").alias("k_tokens"),
        F.expr("CAST((sx * sy - k * sxy) div (k * sxx - sx * sx) AS BIGINT)")
        .alias("zipf_exponent_int"),
        F.expr(
            "CAST(((sx * sy - k * sxy) % (k * sxx - sx * sx)) * 1000000"
            " div (k * sxx - sx * sx) AS BIGINT)"
        ).alias("zipf_exponent_frac_ppm"),
    )


COV_K = 100  # head tokens on the coverage curve


@register(
    "vocab_coverage_curve",
    rf"""
    WITH toks AS (
      SELECT u.token
      FROM (SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
            FROM documents),
           LATERAL (SELECT unnest(ws) AS token) u
    ),
    freq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS f
      FROM toks GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(f) AS BIGINT) AS t FROM freq),
    head AS (
      SELECT token, f,
             row_number() OVER (ORDER BY f DESC, token ASC) AS r
      FROM freq
      ORDER BY f DESC, token ASC LIMIT {COV_K}
    ),
    cum AS (
      SELECT r, token, f,
             CAST(SUM(f) OVER (ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_f
      FROM head
    )
    SELECT CAST(r AS INT) AS rank, token,
           f AS token_count, cum_f,
           CAST(cum_f * 1000000 // t.t AS BIGINT) AS coverage_ppm
    FROM cum CROSS JOIN tot t
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE CURVE — the tokenizer-sizing statistic next
    to zipf_slope_tokens and vocab_growth_curve: for the top-{COV_K}
    corpus tokens by frequency, the cumulative fraction of ALL token
    occurrences the head covers at each rank (how much of the stream a
    K-entry vocabulary explains — where this curve flattens is where a
    vocab/merge-table stops paying). Coverage is ppm-quantized integer
    division of exact BIGINT counts.

    Scale: one tokenize pass to token-grain counts (map-side
    combined), a TakeOrdered top-{COV_K} head, one 1-row total, and
    the running sum windows over {COV_K} rows only — never the
    vocabulary."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(norm_text("text"), " ")).alias("token"))
    freq = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("f"))
    return _coverage_epilogue(freq)


def _coverage_epilogue(freq: DataFrame) -> DataFrame:
    """Coverage-curve epilogue over a (token, f) frequency frame —
    shared by the batch vocab_coverage_curve and the token-store-served
    stream_vocab_coverage (streaming.stream_queries)."""
    tot = freq.agg(F.sum("f").cast("bigint").alias("t"))
    head = freq.orderBy(F.col("f").desc(), F.col("token").asc()).limit(COV_K)
    w = W.orderBy(F.col("f").desc(), F.col("token").asc())
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        head.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("cum_f", F.sum("f").over(wcum).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "token",
            F.col("f").alias("token_count"),
            "cum_f",
            F.expr("CAST(cum_f * 1000000 div t AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
    )


# Character classes profiled per language: ASCII letters, digits,
# whitespace, sentence punctuation. The whitespace class is spelled
# explicitly as [ \t\n\f\r] rather than \s because Java regex \s
# includes \x0B (vertical tab) while DuckDB's RE2 \s does not — an
# explicit class guarantees identical semantics in both engines.
_CCLS = [
    ("letter", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", "[ \\t\\n\\f\\r]"),
    ("punct", "[.,;:!?]"),
]


@register(
    "char_class_profile",
    f"""
    WITH per AS (
      SELECT lang,
             CAST(length(text) AS BIGINT) AS n_all,
             {", ".join(
               f"CAST(length(text) - length(regexp_replace(text, '{pat}', '', 'g')) AS BIGINT) AS n_{name}"
               for name, pat in _CCLS
             )}
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_all) AS BIGINT) AS total_chars,
           {", ".join(
             f"CAST(SUM(n_{name}) * 1000000 // SUM(n_all) AS BIGINT) AS {name}_ppm"
             for name, _ in _CCLS
           )},
           CAST((SUM(n_all) - {" - ".join(f"SUM(n_{name})" for name, _ in _CCLS)})
                * 1000000 // SUM(n_all) AS BIGINT) AS other_ppm
    FROM per GROUP BY lang
    """,
)
def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-CLASS PROFILE per language — the charset QA artifact
    next to langid_heuristic and the quality scorers: per-language ppm
    shares of ASCII letters, digits, whitespace, and sentence
    punctuation (plus the `other` remainder — the non-ASCII mass that
    separates Latin-script from CJK corpora and flags mojibake or
    markup contamination when it moves). Counts are per-document
    length deltas under single-character-class regex deletion
    (identical semantics in both engines), summed as BIGINT and
    ppm-quantized against total characters.

    Scale: map-only per-document counting (each document is scanned a
    constant number of times by the JVM regex engine, no Python), then
    one map-side-combined aggregate to |languages| rows."""
    d = table(spark, sf_dir, "documents")
    cols = [
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), pat, ""))
        )
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat in _CCLS
    ]
    per = d.select(
        "lang", F.length("text").cast("bigint").alias("n_all"), *cols
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_all").cast("bigint").alias("total_chars"),
    ]
    sums = {name: F.sum(f"n_{name}") for name, _ in _CCLS}
    agg = per.groupBy("lang").agg(
        *aggs, *[s.cast("bigint").alias(f"s_{n}") for n, s in sums.items()]
    )
    other_sql = " - ".join([f"total_chars"] + [f"s_{name}" for name, _ in _CCLS])
    return agg.select(
        "lang",
        "n_docs",
        "total_chars",
        *[
            F.expr(f"CAST(s_{name} * 1000000 div total_chars AS BIGINT)").alias(
                f"{name}_ppm"
            )
            for name, _ in _CCLS
        ],
        F.expr(
            f"CAST(({other_sql}) * 1000000 div total_chars AS BIGINT)"
        ).alias("other_ppm"),
    )


# --- Deterministic Poisson bootstrap CI ------------------------------------
#
# Replicate weights are Poisson(1) draws via inverse-CDF over the
# 60-bit md5 uniform (hex_hash64 range [0, 2^60)): the CDF cut points
# are Python-precomputed integer literals (the RBO/SPRT
# precomputed-constant pattern — no engine exp()), identical in both
# engines, truncated at w=9 (P[X>9] < 1e-7; the truncation is part of
# the operator's definition, applied identically everywhere). This is
# the standard streaming bootstrap (one pass, no resampling index) —
# each replicate's multinomial resample is approximated by independent
# Poisson(1) per-document counts, exact enough for a CI and fully
# deterministic under the hash.
BOOT_REPS = 48
_POIS1_CUTS = [  # ~floor(CDF_Poisson(1)(k) * 2^60), k = 0..8 — float64-
    # computed literals, off the exact integer floor by ~15-80 (e.g. k=0
    # exact is ...305329, stored ...305344). Deliberately NOT regenerated
    # exactly: only cross-engine identity matters, and the identical
    # literals are substituted into both engines' SQL (r18, ADVICE).
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
    1152920207336574720,
]
_POIS1_W_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS1_CUTS)
    )
    + " ELSE 9 END"
)
# 2.5% / 97.5% order statistics of BOOT_REPS sorted replicate means
# (indices floor(0.025·(B−1))+1 and floor(0.975·(B−1))+1, 1-based).
_BOOT_LO_RN = int(0.025 * (BOOT_REPS - 1)) + 1
_BOOT_HI_RN = int(0.975 * (BOOT_REPS - 1)) + 1


@register(
    "bootstrap_quality_ci",
    rf"""
    WITH q AS (
      SELECT doc_id,
             CAST(floor((
               (CAST(length(regexp_extract_all(lower(text),
                     '\b(the|and|of|to|a|in|is)\b')) AS DOUBLE) /
                greatest(length(regexp_extract_all(text, '\S+')), 1)) * 2.0
               - (CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                  / length(text)) * 3.0
               + (CASE WHEN greatest(length(regexp_extract_all(text, '\S+')), 1)
                       BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
             ) * 1000000) AS BIGINT) AS ql
      FROM documents
    ),
    drawn AS (
      SELECT r.r, q.ql,
             CAST(concat('0x', substr(md5(concat('bs|', r.r, '|', q.doc_id)),
                                      1, 15)) AS BIGINT) AS u
      FROM q, LATERAL (SELECT unnest(generate_series(0, {BOOT_REPS - 1})) AS r) r
    ),
    w AS (SELECT r, ql, {_POIS1_W_SQL} AS wt FROM drawn),
    reps AS (
      SELECT r, CAST(SUM(wt) AS BIGINT) AS sw,
             CAST(SUM(CAST(wt AS BIGINT) * ql) AS BIGINT) AS swql
      FROM w GROUP BY r
    ),
    means AS (
      SELECT r,
             CAST(CASE WHEN sw = 0 THEN 0
                  ELSE floor(CAST(swql AS DOUBLE) / sw) END AS BIGINT) AS m_q,
             row_number() OVER (
               ORDER BY CASE WHEN sw = 0 THEN 0
                        ELSE floor(CAST(swql AS DOUBLE) / sw) END, r
             ) AS rn
      FROM reps
    ),
    est AS (
      SELECT CAST(floor(CAST(SUM(ql) AS DOUBLE) / COUNT(*)) AS BIGINT) AS e
      FROM q
    )
    SELECT CAST({BOOT_REPS} AS BIGINT) AS n_reps,
           est.e AS est_mean_q,
           (SELECT m_q FROM means WHERE rn = {_BOOT_LO_RN}) AS ci_lo_q,
           (SELECT m_q FROM means WHERE rn = {_BOOT_HI_RN}) AS ci_hi_q
    FROM est
    """,
)
def bootstrap_quality_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC POISSON BOOTSTRAP CI for the corpus mean quality
    score — the uncertainty quantification every curation dashboard
    number should carry (Efron 1979 percentile bootstrap; the
    one-pass Poissonized form is the standard at-scale variant since
    each document's {BOOT_REPS} replicate weights are independent
    Poisson(1) draws needing no global resample index). Replicate r's
    weight for a document is the inverse-CDF of the 60-bit md5 uniform
    of ('bs|', r, doc_id) against Python-precomputed integer CDF cut
    points — reproducible to the bit across engines, runs, and
    cluster sizes. Reports the point estimate and the 2.5%/97.5%
    order statistics of the {BOOT_REPS} replicate means (quality in
    the established ppm quantization, means floored).

    Scale: a {BOOT_REPS}x map-only explode (each document is scored
    once, then emits {BOOT_REPS} tiny (r, weight) rows) collapsing
    under map-side combine to exactly {BOOT_REPS} partial-sum rows —
    embarrassingly parallel, no shuffle wider than {BOOT_REPS} rows,
    no driver collect beyond the final frame; the CI pick is a window
    over a {BOOT_REPS}-row frame."""
    d = table(spark, sf_dir, "documents")
    q = _quality_of(d).select(
        "doc_id",
        F.floor(F.col("quality_score") * 1000000.0).cast("bigint").alias("ql"),
    )
    drawn = q.select(
        "ql",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))).alias("r"),
        "doc_id",
    ).select(
        "r",
        "ql",
        hex_hash64(
            F.concat(F.lit("bs|"), F.col("r"), F.lit("|"), F.col("doc_id"))
        ).alias("u"),
    )
    reps = (
        drawn.select("r", "ql", F.expr(_POIS1_W_SQL).alias("wt"))
        .groupBy("r")
        .agg(
            F.sum("wt").cast("bigint").alias("sw"),
            F.sum(F.expr("CAST(wt AS BIGINT) * ql")).cast("bigint").alias("swql"),
        )
    )
    from pyspark.sql.window import Window as W

    m_q = F.expr(
        "CAST(CASE WHEN sw = 0 THEN 0"
        " ELSE floor(CAST(swql AS DOUBLE) / sw) END AS BIGINT)"
    )
    means = reps.select("r", m_q.alias("m_q")).withColumn(
        "rn", F.row_number().over(W.orderBy(F.col("m_q"), F.col("r")))
    )
    est = q.agg(
        F.expr(
            "CAST(floor(CAST(SUM(ql) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        ).alias("est_mean_q")
    )
    lo = means.filter(F.col("rn") == _BOOT_LO_RN).select(
        F.col("m_q").alias("ci_lo_q")
    )
    hi = means.filter(F.col("rn") == _BOOT_HI_RN).select(
        F.col("m_q").alias("ci_hi_q")
    )
    return (
        est.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.lit(BOOT_REPS).cast("bigint").alias("n_reps"),
            "est_mean_q",
            "ci_lo_q",
            "ci_hi_q",
        )
    )


# --- Flesch readability profile --------------------------------------------
FLESCH_EASY_MILLI = 60_000  # score >= 60.0 reads as "plain English"


@register(
    "flesch_readability_profile",
    rf"""
    WITH per AS (
      SELECT lang,
             CAST(floor((
               206.835
               - 1.015 * (CAST(greatest(length(regexp_extract_all(text,
                     '\S+')), 1) AS DOUBLE)
                   / greatest(length(regexp_extract_all(text, '[.!?]+')), 1))
               - 84.6 * (CAST(greatest(length(regexp_extract_all(lower(text),
                     '[aeiouy]+')), 1) AS DOUBLE)
                   / greatest(length(regexp_extract_all(text, '\S+')), 1))
             ) * 1000) AS BIGINT) AS f_milli
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_milli) // COUNT(*) AS BIGINT) AS mean_flesch_milli,
           CAST(SUM(CASE WHEN f_milli >= {FLESCH_EASY_MILLI}
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS easy_ppm
    FROM per GROUP BY lang
    """,
)
def flesch_readability_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING-EASE profile per language — the readability
    feature every curation stack scores next to the Gopher-style
    quality heuristics (Flesch 1948; 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words)): syllables proxied by lowercase vowel
    GROUPS ([aeiouy]+, the standard regex approximation), sentences by
    terminal-punctuation runs ([.!?]+), every denominator floored at 1.
    Per-document scores are milli-floored BEFORE the per-language
    mean (quantize-then-sum), the mean is exact integer FLOOR division
    (scores go negative for run-on text — Spark side uses the pmod
    form to match DuckDB's //), and the 'plain-English' share
    (score ≥ 60) is ppm-quantized.

    CROSS-ENGINE ASSUMPTION (r18, ADVICE): the word regex \\S+ (here
    and in the Gopher-style scorers that share the idiom) treats
    \\x0B (vertical tab) as whitespace in Java regex but not in
    DuckDB's RE2, the same divergence class the _CCLS fix spelled
    away explicitly. The operators rely on the FIXTURE-LEVEL
    invariant that document text contains no \\x0B — verified
    empirically across sf0.001/0.01/0.1 this round; a corpus with
    vertical tabs needs the _CCLS-style explicit class
    ([^ \\t\\n\\f\\r]+) substituted in BOTH engines.

    Scale: map-only per-document regex counting (JVM regex, no
    Python) + one |languages|-row aggregate with map-side combine —
    char_class_profile's plan shape with a composed statistic."""
    d = table(spark, sf_dir, "documents")
    words = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)), F.lit(1)
    ).cast("double")
    sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)), F.lit(1)
    )
    syls = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
        ),
        F.lit(1),
    ).cast("double")
    per = d.select(
        "lang",
        F.floor(
            (
                F.lit(206.835)
                - F.lit(1.015) * (words / sents)
                - F.lit(84.6) * (syls / words)
            )
            * 1000
        )
        .cast("bigint")
        .alias("f_milli"),
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(
            "CAST((SUM(f_milli) - pmod(SUM(f_milli), COUNT(*)))"
            " div COUNT(*) AS BIGINT)"
        ).alias("mean_flesch_milli"),
        F.expr(
            f"CAST(SUM(CASE WHEN f_milli >= {FLESCH_EASY_MILLI}"
            f" THEN 1 ELSE 0 END) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("easy_ppm"),
    )
