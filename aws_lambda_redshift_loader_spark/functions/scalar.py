"""Scalar function layer (SURVEY.md §2.8, reference F1-F8).

All helpers return Column expressions built from JVM-side built-ins
(`pyspark.sql.functions`) so they stay inside whole-stage codegen — no
Python UDFs in the hot path.

Cross-engine determinism notes (the DuckDB oracle hash-compares values):

- ``dec``: double aggregates are order-dependent under parallelism, so SUM
  goes through DECIMAL (exact) and is cast back to DOUBLE at the end; both
  engines then produce bit-identical doubles.
- ``hex_hash64``: a deterministic 60-bit integer hash both engines can
  compute (md5 hex prefix → int). Spark `hash()` / DuckDB `hash()` are
  different algorithms, so any operator whose *results* depend on hash
  values (minhash, simhash, LSH) uses this instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, precision: int = 18, scale: int = 4) -> Column:
    """Cast to exact DECIMAL for order-independent aggregation.

    Reference analog: running batch byte size `ADD size :size`
    (index.js:344,370-372) is an exact integer accumulation; our numeric
    aggregates keep the same exactness via DECIMAL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def hex_hash64(col: Column, salt: str | Column | None = None) -> Column:
    """Deterministic 60-bit positive int64 hash from md5 (cross-engine).

    DuckDB equivalent: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    """
    if salt is not None:
        s = F.lit(salt) if isinstance(salt, str) else salt
        col = F.concat(s, col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def norm_text(col: str | Column) -> Column:
    """Normalize text for fingerprinting: lowercase + collapse whitespace.

    DuckDB equivalent:
    ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def strip_filename(path: Column) -> Column:
    """Key → prefix projection (reference P3, index.js:1585-1601):
    drop the trailing `/filename` segment."""
    return F.regexp_replace(path, r"/[^/]+$", "")


def wildcard_hive(path: Column) -> Column:
    """Hive-style `name=value` → `name=*` (reference P4,
    transformHiveStylePrefix common.js:36-54). In real Spark ingestion,
    hive-style dirs are partition columns and discovery subsumes this;
    kept as the routing-parity scalar."""
    return F.regexp_replace(path, r"=[^/]+", "=*")


# Karp-Rabin rolling-hash machinery shared by winnowing_fingerprints
# (text.py) and cdc_chunks (dedup.py). Every Horner step is exact in
# int64 (acc < 2^31 = ROLL_P, acc*ROLL_B + c < 2^51), so the DuckDB
# oracle's list_reduce computes bit-identical hashes; the codepoint
# array makes char access O(1) (substring-per-char is an O(pos) UTF-8
# scan that turns long docs quadratic).
ROLL_B = 1000003
ROLL_P = 2147483647


def codes_expr(text_sql: str = "lower(text)") -> str:
    """Spark SQL: text → codepoint array (once per row)."""
    return f"transform(split({text_sql}, ''), c -> ascii(c))"


def rolling_hash_expr(k: int, codes: str = "codes") -> str:
    """Spark SQL: codepoint array → array of k-gram Karp-Rabin hashes
    (one per position 1..n-k+1)."""
    return (
        f"transform(sequence(1, size({codes}) - {k} + 1), "
        f"i -> aggregate(sequence(i, i + {k} - 1), 0L, "
        f"(acc, j) -> (acc * {ROLL_B} + element_at({codes}, j)) % {ROLL_P}))"
    )


def make_kr_gram_hasher(k: int):
    """Vectorized numpy twin of :func:`rolling_hash_expr` — r18, guide
    §4.2 (hand whole batches to vectorized native code instead of
    interpreted expressions): Catalyst higher-order functions
    (``transform``/``aggregate``) are CodegenFallback, so the O(n·k)
    per-gram Horner loop ran interpreted per element and dominated the
    CDC/winnowing family (isolated: 2.6 s of cdc_chunks' 2.7 s chunk
    pass at sf0.1). This closure computes the identical int64 hashes in
    O(n) numpy per document.

    Exactness argument (the oracle hash-gates it): stepwise-mod Horner
    equals the full polynomial mod P, and P = 2^31-1 is prime so B is
    invertible; with prefix Horner values
        H_i = (B^i mod P) * ((Σ_{{j≤i}} c_j·B^{{-j}} mod P) mod P) mod P
    the k-gram hash is G_i = (H_{{i+k-1}} - H_{{i-1}}·B^k) mod P.
    Bounds: codepoints < 2^21, inverse-power terms < P < 2^31, so every
    product < 2^62 and the un-modded cumsum stays < n·2^31 (exact in
    int64 for any document under 2^31 chars).

    Returns a SELF-CONTAINED closure (numpy imported inside, constants
    captured by value, power tables cached in a closure cell and
    extended on demand) so mapInPandas pickles it by value — no
    executor-side import of this module (the driver-contract pickling
    rule)."""
    B, P = ROLL_B, ROLL_P
    inv_b = pow(B, P - 2, P)
    cache: dict[str, object] = {}

    def gram_hashes(text: str):
        import numpy as np

        n = len(text)
        m = n - k + 1
        if m <= 0:
            return np.empty(0, dtype=np.int64)
        pw = cache.get("pw")
        if pw is None or len(pw) <= n + k:
            size = 1024
            while size <= n + k:
                size *= 2
            pw = np.empty(size, dtype=np.int64)
            ipw = np.empty(size, dtype=np.int64)
            pw[0] = ipw[0] = 1
            for i in range(1, size):
                pw[i] = (pw[i - 1] * B) % P
                ipw[i] = (ipw[i - 1] * inv_b) % P
            cache["pw"], cache["ipw"] = pw, ipw
        pw, ipw = cache["pw"], cache["ipw"]
        codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(
            np.int64
        )
        terms = (codes * ipw[1 : n + 1]) % P
        s = np.empty(n + 1, dtype=np.int64)
        s[0] = 0
        np.cumsum(terms, out=s[1:])
        h = (pw[: n + 1] * (s % P)) % P
        return (h[k : n + 1] - (h[:m] * pw[k]) % P) % P

    return gram_hashes


def codes_sql(text_sql: str = "lower(text)") -> str:
    """DuckDB: the same codepoint array."""
    return (
        f"list_transform(string_split({text_sql}, ''),"
        f" c -> CAST(unicode(c) AS BIGINT))"
    )


def rolling_hash_sql(k: int, codes: str = "cs") -> str:
    """DuckDB: the same k-gram hash list (bit-identical to
    rolling_hash_expr)."""
    return (
        f"list_transform(generate_series(1, len({codes}) - {k} + 1), "
        f"i -> list_reduce(list_transform(generate_series(i, i + {k} - 1), "
        f"j -> {codes}[CAST(j AS INT)]), "
        f"(acc, c) -> (acc * {ROLL_B} + c) % {ROLL_P}))"
    )
