"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine.

Scale design notes (the part that matters at 100 TB):
- exact dedup shuffles on a 128-bit content hash — uniformly distributed,
  no skew; row_number-free (min(doc_id) per hash group, map-side partial agg).
- MinHash: shingle explode -> per-doc signature via k min-aggregations of
  xxhash64(shingle, seed) — all JVM built-ins, one shuffle on doc_id;
  banding turns O(n^2) candidate generation into a groupBy on
  (band_idx, band_hash) whose keys are uniform by construction.
- SimHash: bit-vote aggregation, one shuffle; hamming-distance candidate
  pairs via band join on bit slices.
- verification joins (exact Jaccard / cosine) run only on LSH candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# shingling helpers
# --------------------------------------------------------------------------
def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace (canonical form for hashing)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles of the normalized text."""
    words = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


def with_shingle_hashes(
    df: DataFrame, text_col: str, out: str, n: int = 3, keep: list[str] | None = None
) -> DataFrame:
    """Project (keep..., out: array<long>) — one 64-bit hash per word
    n-gram shingle, WITHOUT materializing shingle strings: hash each word
    once, then combine n consecutive word hashes with one fixed-width
    xxhash64. Each input byte is hashed exactly once regardless of n — the
    hot-path form for MinHash at scale (string shingles re-hash every word
    n times per shingle and ~k times more across the k permutations).

    Two projection steps on purpose: the word-hash array must be its own
    alias, else the combine lambda inlines it and recomputes the whole
    array per shingle (O(words^2) hashing).
    """
    keep = keep if keep is not None else [c for c in df.columns if c != text_col]
    wh = F.transform(F.split(normalize_text(F.col(text_col)), " "), lambda w: F.xxhash64(w))
    step = df.select(*keep, wh.alias("__wh"))
    idx = F.sequence(F.lit(1), F.greatest(F.size(F.col("__wh")) - (n - 1), F.lit(1)))
    sh = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.xxhash64(*[F.try_element_at(F.col("__wh"), i + j) for j in range(n)]),
        )
    )
    return step.select(*keep, sh.alias(out))


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized-text duplicate
    group: ONE shuffle on the 128-bit content hash (uniform key), min-id
    window instead of groupBy+self-join."""
    keyed = df.withColumn("__h", F.md5(normalize_text(F.col(text_col))))
    w = Window.partitionBy("__h")
    return (
        keyed.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__h", "__min_id")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    repartition: int | None = 0,
) -> DataFrame:
    """(id, sig: array<bigint>) — k-permutation MinHash via xxhash64 seeds.

    ZERO-shuffle formulation: the shingle set is a per-row array, so each
    hash's min is a per-row array_min(transform(...)) — no explode, no
    groupBy. Scales embarrassingly: signature cost is pure map-side CPU.

    ``repartition``: pre-spread rows before the CPU-heavy projection
    (default 0 = sparkContext.defaultParallelism; None = keep input
    partitioning — tiny parquet inputs otherwise pin the work to 1-2
    tasks).
    """
    if repartition == 0:
        repartition = df.sparkSession.sparkContext.defaultParallelism
    if repartition:
        df = df.repartition(repartition)
    # words are hashed ONCE on the JVM side (split + xxhash64 transform);
    # shingle combination and the k permutation-minima run as one numpy
    # pass per Arrow batch. MinHash is duplicate-insensitive (min over a
    # multiset == min over its set), so no distinct step is needed.
    # Catalyst higher-order expressions for the k minima measured ~3×
    # slower — per-element interpretation, not codegen.
    from pyspark.sql.functions import pandas_udf

    # deterministic odd multipliers + offsets for the k permutations
    # (universal hashing over Z_2^64; wraparound intended)
    a_k = np.array(
        [int.from_bytes(__import__("hashlib").sha256(f"a:{i}".encode()).digest()[:8], "big") | 1
         for i in range(num_hashes)], dtype="uint64",
    )
    b_k = np.array(
        [int.from_bytes(__import__("hashlib").sha256(f"b:{i}".encode()).digest()[:8], "big")
         for i in range(num_hashes)], dtype="uint64",
    )
    c1, c2, c3 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(0x165667B19E3779F9)
    n = shingle_n

    @pandas_udf("array<long>")
    def sigs(harrs: pd.Series) -> pd.Series:
        out = []
        err = np.seterr(over="ignore")
        try:
            for h in harrs:
                # NULL text -> NULL token array from split(); treat as an
                # empty token list (signature of zero-padded shingles)
                # instead of letting np.asarray raise on None.
                if h is None:
                    h = []
                hv = np.asarray(h, dtype="int64").astype("uint64")
                if hv.size < n:
                    hv = np.pad(hv, (0, n - hv.size))
                # combine n consecutive word hashes into one shingle hash
                s = hv[: hv.size - n + 1] * c1
                for j in range(1, n):
                    mult = c2 if j % 2 else c3
                    s = s ^ (hv[j : hv.size - n + 1 + j] * mult)
                # k permutation minima: min over (a_k * s + b_k)
                perms = s[:, None] * a_k[None, :] + b_k[None, :]
                out.append(perms.min(axis=0).astype("int64"))
        finally:
            np.seterr(**err)
        return pd.Series(out)

    harr = F.transform(F.split(normalize_text(F.col(text_col)), " "), lambda t: F.xxhash64(t))
    return df.select(F.col(id_col), sigs(harr).alias("sig"))


def band_buckets(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    sig_len: int | None = None,
) -> DataFrame:
    """(id, band, bh): each doc's LSH bucket key per band — the join/shuffle
    key of the banding stage, exposed so skew tests and diagnostics can
    measure bucket-size distributions directly."""
    if sig_len is None:
        sig_len = sig_df.selectExpr("size(sig) AS n").limit(1).collect()[0].n
    if num_bands > sig_len:
        # F.slice past the array end yields [] and xxhash64([]) is one
        # constant, so the excess bands would put EVERY doc in a shared
        # bucket — in the unverified dedup path that silently collapses
        # the corpus to the global min id. Reject, don't corrupt.
        raise ValueError(
            f"band_buckets: num_bands={num_bands} exceeds signature "
            f"length {sig_len} — use num_bands <= num_hashes"
        )
    rows_per_band = max(1, sig_len // num_bands)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            # xxhash64 hashes the array column directly — no serialization
            F.xxhash64(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)).alias("bh"),
        )
        for b in range(num_bands)
    ]
    return sig_df.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bx")
    ).select(id_col, "bx.band", "bx.bh")


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    sig_len: int | None = None,
) -> DataFrame:
    """Banding: docs sharing any band of their signature become candidate
    pairs (a < b). groupBy key = (band index, band hash) — uniform over
    DISTINCT texts; exact duplicates must be pre-collapsed (see
    minhash_dedup) or a bucket of m identical docs emits m^2/2 pairs."""
    bands = band_buckets(sig_df, id_col, num_bands, sig_len)
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def _source_is_cached(df: DataFrame) -> bool:
    """True when the plan reads an InMemoryRelation (a .cache()d source).

    Why it matters: AQE's ReusedExchange dedupes repeated subtrees by
    CANONICAL PLAN EQUALITY, and InMemoryTableScan instances defeat that
    equality — measured on the banded minhash plan, a cached source turns
    6 reused exchanges into ~80 independently-executed stages (every band
    recomputes the signatures). Operators that bet on exchange reuse must
    switch to an explicit persist in this regime."""
    try:
        return "InMemoryRelation" in df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float | None = None,
    signature_reuse: str = "auto",
    exact_precollapse: bool = True,
) -> DataFrame:
    """Near-dup removal: LSH candidates (optionally verified with exact
    shingle Jaccard) -> each doc joins its smallest candidate neighbor;
    keep docs that are their own group minimum.

    ``exact_precollapse`` (default on) first collapses EXACT normalized
    duplicates to their min-id representative with one uniform content-hash
    shuffle. This is the adversarial-skew guard: a boilerplate page
    repeated m times shares every band hash, so the banding self-join
    would emit m^2/2 pairs in one bucket (10M copies -> 5e13 pairs). The
    keep-set is provably unchanged — identical docs share signatures (LSH
    would collapse them to the same min id) and jaccard(identical)=1
    passes any threshold, so pre-collapsing only reroutes those drops
    through the cheap exact stage.

    The signature subtree appears on both self-join sides and under
    ids / verification / losers. ``signature_reuse`` controls how the
    repeated computation collapses:

    - ``"aqe"``: rely on AQE's ReusedExchange (runtime-guarded in
      tests/test_plans.py). Measured faster than persist on file-scan
      sources — no job barriers.
    - ``"persist"``: cache the signature frame explicitly.
    - ``"auto"`` (default): "aqe" normally, but "persist" when the INPUT
      is itself .cache()d — InMemoryTableScan breaks AQE's canonical
      plan equality, silently re-running the Arrow signature pass once
      per band (measured: 6 reused exchanges -> ~80 live stages).
    """
    work = exact_dedup(df, text_col, id_col) if exact_precollapse else df
    sig = minhash_signatures(work, text_col, id_col, num_hashes, shingle_n)
    if signature_reuse not in ("auto", "aqe", "persist"):
        raise ValueError(f"unknown signature_reuse {signature_reuse!r}")
    if signature_reuse == "persist" or (
        signature_reuse == "auto" and _source_is_cached(df)
    ):
        # EAGER materialization is the point: a lazy persist inside one
        # action lets every band-side reference race the still-empty
        # cache and recompute anyway. localCheckpoint rather than
        # persist(): one job computes the Arrow signature pass exactly
        # once, downstream reads blocks, and the blocks are auto-cleaned
        # when the RDD is garbage-collected — a cacheManager persist
        # would leak one session-lifetime cache entry per call.
        sig = sig.localCheckpoint(eager=True)
    if jaccard_threshold is None:
        # UNVERIFIED path: the keep rule is "dropped iff some smaller-id
        # candidate shares a band", and a candidate c < d in bucket b
        # implies bucket_min(b) <= c < d — so star edges to each bucket's
        # min id give the IDENTICAL keep set as all pairwise candidates,
        # in O(bucket) instead of O(bucket^2). This is the template-
        # cluster skew guard: 10M near-identical pages share buckets even
        # after the exact pre-collapse, and the pairwise self-join would
        # emit 5e13 rows there. groupBy min is map-side combinable and
        # the co-partitioned join back is AQE-skew-splittable.
        bands = band_buckets(sig, id_col, num_bands, sig_len=num_hashes)
        bmin = bands.groupBy("band", "bh").agg(F.min(id_col).alias("__bmin"))
        losers = (
            bands.join(bmin, ["band", "bh"])
            .filter(F.col(id_col) > F.col("__bmin"))
            .select(id_col)
            .distinct()
        )
    else:
        # VERIFIED path: star edges are not equivalent (a doc may fail
        # verification against the bucket min yet pass against another
        # member), so candidates stay pairwise — bounded by the exact
        # pre-collapse for identical docs; template-scale NEAR-dup
        # clusters remain quadratic here by the semantics of pairwise
        # verification itself.
        pairs = lsh_candidate_pairs(sig, id_col, num_bands, sig_len=num_hashes)
        verified = ngram_jaccard_pairs(work, pairs, text_col, id_col, shingle_n)
        pairs = verified.filter(F.col("jaccard") >= jaccard_threshold).select("id_a", "id_b")
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    # exact losers (df minus work) were already dropped by the pre-collapse
    return work.join(losers, id_col, "left_anti")


def dedup_against_history(
    df: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    update_state: bool = False,
) -> DataFrame:
    """Near-dup filter against everything EVER ingested: drop docs whose
    MinHash signature shares any LSH band bucket with the band-hash
    history table at ``state_dir``. This is the incremental-ingest analog
    of minhash_dedup — the shape a daily crawl pipeline runs against its
    accumulated corpus, and the cross-batch stage of the streaming
    wrapper (neardup_foreach_batch).

    CRASH ORDERING: state must be appended AFTER the caller persists the
    survivors — call ``append_history`` once your sink write commits
    (``update_state=False``, the default). Passing ``update_state=True``
    appends eagerly, which is convenient for fire-and-forget batch jobs
    but opens a replay-loss window: a crash between this call and your
    sink write makes the rerun drop the docs against their own
    first-attempt bands.

    Scale shape: the history table holds num_bands small rows per
    distinct ingested doc (two longs each) — far smaller than the corpus
    text; the membership check is a left-anti/semi join keyed on the
    uniform (band, bh) pair, AQE-skew-splittable. Appends are blind
    parquet writes; duplicate band rows from replayed batches are
    harmless (membership semantics), so the state update is idempotent
    at the semantic level. Returns the surviving rows of ``df``.
    """
    spark = df.sparkSession
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    bands = band_buckets(sig, id_col, num_bands, sig_len=num_hashes)
    # probe state through Spark, not the local filesystem: state_dir may
    # be s3a:// / hdfs:// in the deployment shape this operator targets,
    # where os.path checks are always False and the filter would silently
    # no-op while appends kept succeeding
    seen = _try_read_parquet(spark, history_data_dir(spark, state_dir))
    if seen is not None:
        losers = (
            bands.join(seen, ["band", "bh"], "left_semi")
            .select(id_col)
            .distinct()
        )
        kept = df.join(losers, id_col, "left_anti")
    else:
        kept = df
    # pin the survivor set BEFORE appending: the returned frame and the
    # state write must not lazily re-read a state dir that now contains
    # this batch's own bands (self-poisoning), and the signature pass
    # should run once, not once per downstream action
    kept = kept.localCheckpoint(eager=True)
    if update_state:
        append_history(kept, state_dir, text_col, id_col, num_hashes,
                       num_bands, shingle_n)
    return kept


def _try_read_parquet(spark, path: str):
    """Read a parquet table, returning None when it does not exist yet
    (missing path, or a directory with no data files). Probing through
    Spark — instead of os.path — keeps remote state URIs (s3a://,
    hdfs://) working. Only the two no-state-yet error classes map to
    None; any OTHER AnalysisException (corrupt footer, permission,
    schema conflict) re-raises — a dedup history that exists but cannot
    be read must fail loudly, not silently keep every duplicate."""
    from pyspark.errors import AnalysisException

    _MISSING = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")

    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so a missing path fails HERE, not lazily
        return df
    except AnalysisException as e:
        cls = getattr(e, "getErrorClass", lambda: None)() or ""
        if cls in _MISSING or any(m in str(e) for m in _MISSING):
            return None
        raise


def _hadoop_fs(spark, uri: str):
    """(FileSystem, Path) for any Hadoop-supported URI (file://, s3a://,
    hdfs://, scheme-less local) via the session's Hadoop conf."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(uri)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p


def _read_manifest(spark, root: str) -> str | None:
    """Raw contents of ``root/MANIFEST`` (stripped), or None when the
    file is absent (flat legacy layout / store never compacted). An
    EMPTY or malformed manifest is returned as-is — callers validate
    with ``_is_version_dir`` and must treat invalid contents as
    corruption, never as "flat layout": a truncated manifest with
    version dirs still on disk means the pointer was lost, not that the
    data lives at the root."""
    fs, p = _hadoop_fs(spark, root.rstrip("/") + "/MANIFEST")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        out = bytearray()
        b = stream.read()
        while b != -1:
            out.append(b)
            b = stream.read()
    finally:
        stream.close()
    return out.decode("utf-8", errors="replace").strip()


_OBJECT_STORE_SCHEMES = {
    "s3", "s3a", "s3n", "gs", "gcs", "wasb", "wasbs", "abfs", "abfss",
    "oss", "cos", "swift",
}


def _write_manifest(spark, root: str, version: str) -> None:
    """Flip ``root/MANIFEST`` to ``version``.

    Object stores get a direct single-object overwrite — a PUT is
    atomic there, and tmp+rename would be a non-atomic copy+delete.
    Rename-capable filesystems (file://, hdfs://) instead write
    ``MANIFEST.tmp`` and rename it onto ``MANIFEST``: ``fs.create(p,
    overwrite=True)`` truncates before writing, so a crash mid-overwrite
    would leave an empty/partial manifest, while rename is atomic.
    Where rename refuses an existing destination (HDFS semantics) we
    fall back to delete-then-rename; the resulting two-metadata-op
    window is covered by _compact_history_manifest's refusal to treat
    version dirs without a manifest as a flat store."""
    base = root.rstrip("/")
    scheme = base.split("://", 1)[0].lower() if "://" in base else ""
    fs, p = _hadoop_fs(spark, base + "/MANIFEST")
    if scheme in _OBJECT_STORE_SCHEMES:
        stream = fs.create(p, True)
        try:
            stream.write(bytearray(version.encode("utf-8")))
        finally:
            stream.close()
        return
    _, tmp = _hadoop_fs(spark, base + "/MANIFEST.tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(version.encode("utf-8")))
    finally:
        stream.close()
    if not fs.rename(tmp, p):
        fs.delete(p, False)
        if not fs.rename(tmp, p):
            raise IOError(f"manifest flip failed for {base}")


def history_data_dir(spark, state_dir: str) -> str:
    """Resolve the LIVE data directory of a dedup history store: the
    manifest-pointed version dir when ``state_dir/MANIFEST`` exists
    (remote-compacted store), else ``state_dir`` itself (flat layout).
    Readers and appenders both route through this, so a manifest flip
    redirects every subsequent batch without coordination. A manifest
    that exists but doesn't parse as a version pointer is corruption —
    raise rather than silently reading the (possibly already-migrated)
    flat root."""
    ptr = _read_manifest(spark, state_dir)
    if ptr is None:
        return state_dir
    if not _is_version_dir(ptr):
        raise RuntimeError(
            f"corrupt MANIFEST in {state_dir!r}: {ptr!r} is not a version "
            "pointer; restore it to the newest complete vNNNNNN directory"
        )
    return f"{state_dir.rstrip('/')}/{ptr}"


def append_history(
    df: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
) -> None:
    """Append ``df``'s band hashes to the dedup history table. Split out
    of dedup_against_history so streaming callers can order it AFTER the
    sink write: state-before-sink loses documents on a crash between the
    two (the replay drops them against their own first-attempt bands);
    sink-before-state merely re-emits on replay — the standard
    at-least-once foreachBatch contract."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_buckets(sig, id_col, num_bands, sig_len=num_hashes).select(
        "band", "bh"
    ).write.mode("append").parquet(history_data_dir(df.sparkSession, state_dir))


def compact_history(spark, state_dir: str) -> int:
    """Offline maintenance for dedup_against_history's band table:
    replayed batches and per-batch appends accumulate duplicate
    (band, bh) rows that don't change membership but inflate the
    semi-join scan. Rewrites the table as distinct rows via
    tmp-write-then-swap. Run BETWEEN ingest batches (the swap is not
    safe against a concurrent reader mid-plan). Returns the compacted
    row count.

    Crash safety, local path: the live dir is renamed ASIDE first, then
    the compacted tmp renamed into place, then the old copy deleted — at
    every point at least one complete copy of the history exists under a
    readable name (a crash between the two renames leaves
    ``state_dir + '.old'``, which the next call restores automatically).

    Remote stores (any ``scheme://`` URI — s3a://, hdfs://, file://)
    can't rely on atomic directory renames, so they use the
    write-new-dir + manifest-pointer-flip layout instead: compacted rows
    land in ``state_dir/vNNNNNN/``, then the one-object
    ``state_dir/MANIFEST`` is flipped to the new version (atomic PUT on
    S3), then stale versions are deleted. ``append_history`` and
    ``dedup_against_history`` resolve the pointer on every call
    (``history_data_dir``), so the flip redirects subsequent batches
    without coordination; a crash at ANY point leaves the manifest on a
    complete version (orphan next-version dirs are cleaned up by the
    following compaction). The first remote compaction migrates a flat
    store into this layout."""
    import os
    import shutil

    if "://" in state_dir:
        return _compact_history_manifest(spark, state_dir)
    base = state_dir.rstrip("/")
    tmp = base + ".compact.tmp"
    old = base + ".old"
    if not os.path.isdir(base) and os.path.isdir(old):
        # recover from a crash between the two renames of a prior run
        os.rename(old, base)
    distinct = spark.read.parquet(base).distinct()
    shutil.rmtree(tmp, ignore_errors=True)
    distinct.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(old, ignore_errors=True)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
    return n


_VERSION_RE = None


def _is_version_dir(name: str) -> bool:
    global _VERSION_RE
    if _VERSION_RE is None:
        import re

        _VERSION_RE = re.compile(r"^v\d{6}$")
    return bool(_VERSION_RE.match(name))


def _compact_history_manifest(spark, state_dir: str) -> int:
    """Remote-store compaction: write-new-version + manifest flip (see
    compact_history). Sequencing guarantees a complete, manifest-
    reachable copy exists at every instant:

      1. orphan version dirs (crashed prior attempts, never flipped
         live) are deleted;
      2. the live data (manifest-pointed dir, or the flat root on first
         migration) is read and written DISTINCT to the next version;
      3. the manifest flips (single-object overwrite);
      4. stale data — older versions, and on migration the flat root's
         top-level files — is deleted.
    """
    base = state_dir.rstrip("/")
    fs, base_path = _hadoop_fs(spark, base)
    cur = _read_manifest(spark, base)

    # 0. corruption guard: a missing/unparseable manifest WITH version
    # dirs on disk means the pointer was lost (e.g. a crash inside a
    # non-atomic manifest write), NOT that the store is flat — migrating
    # here would delete every version dir in the orphan sweep below and
    # destroy the history. Refuse and ask for a manual pointer restore.
    if cur is not None and not _is_version_dir(cur):
        raise RuntimeError(
            f"corrupt MANIFEST in {base!r}: {cur!r}; restore it to the "
            "newest complete vNNNNNN directory before compacting"
        )
    if cur is None and fs.exists(base_path) and any(
        st.isDirectory() and _is_version_dir(st.getPath().getName())
        for st in fs.listStatus(base_path)
    ):
        raise RuntimeError(
            f"{base!r} has vNNNNNN version dirs but no MANIFEST — "
            "refusing to treat it as a flat store (migration would "
            "delete the versions); write MANIFEST pointing at the "
            "newest complete version to recover"
        )

    # 1. remove never-flipped orphans so the flat-root read (migration)
    # can't pick up their part files, and version numbering stays clean
    if fs.exists(base_path):
        for st in fs.listStatus(base_path):
            name = st.getPath().getName()
            if st.isDirectory() and _is_version_dir(name) and name != cur:
                fs.delete(st.getPath(), True)

    live = f"{base}/{cur}" if cur else base
    nxt = f"v{(int(cur[1:]) + 1) if cur else 1:06d}"
    distinct = spark.read.parquet(live).distinct()
    distinct.write.mode("overwrite").parquet(f"{base}/{nxt}")
    n = spark.read.parquet(f"{base}/{nxt}").count()
    _write_manifest(spark, base, nxt)
    # 4. stale cleanup: prior version, plus flat top-level files on the
    # migration pass (a crash here is harmless — the next compaction
    # re-runs this loop)
    for st in fs.listStatus(base_path):
        name = st.getPath().getName()
        if name in (nxt, "MANIFEST"):
            continue
        if st.isDirectory() and _is_version_dir(name):
            fs.delete(st.getPath(), True)
        elif cur is None and st.isFile():
            fs.delete(st.getPath(), False)
    return n


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given (id_a, id_b) pairs.

    Scale shape: candidates ≪ corpus, so (1) semi-join prunes the corpus to
    candidate docs BEFORE shingling, (2) the pair list broadcasts — the
    corpus side never shuffles on text. Set ops run on 64-bit shingle
    hashes, not strings (collision odds ~ |set|^2 / 2^64 — immaterial to a
    0.8-ish threshold decision).
    """
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand = df.join(F.broadcast(ids), id_col, "left_semi")
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = with_shingle_hashes(cand.repartition(par), text_col, "sh", shingle_n, keep=[id_col])
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    j = F.broadcast(pairs).join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "id_a", "id_b", F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard")
    )


def ngram_jaccard_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 16,
) -> DataFrame:
    """LSH-candidates + exact Jaccard verification dedup."""
    return minhash_dedup(
        df, text_col, id_col, num_hashes, num_bands, shingle_n, jaccard_threshold=threshold
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens: per-bit weighted vote of token
    hashes. ZERO-shuffle formulation: token hashes are a per-row JVM array
    (split + xxhash64 transform), and the bit votes run as one
    Arrow-batched numpy pass per row-batch — an explode + groupBy(id) with
    64 conditional sums measured ~2× slower and added a full shuffle."""
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(bits, dtype="uint64")

    @pandas_udf("long")
    def sim(harrs: pd.Series) -> pd.Series:
        out = np.empty(len(harrs), dtype="uint64")
        for i, h in enumerate(harrs):
            # NULL text -> None token array; same fingerprint as empty text
            if h is None:
                h = []
            hv = np.asarray(h, dtype="int64").astype("uint64")
            if hv.size == 0:
                out[i] = 0
                continue
            ones = ((hv[:, None] >> shifts) & 1).sum(axis=0)  # per-bit 1-votes
            # vote = ones - zeros > 0  <=>  2*ones > n
            out[i] = np.bitwise_or.reduce(
                np.where(2 * ones > hv.size, np.uint64(1) << shifts, np.uint64(0))
            )
        return pd.Series(out.astype("int64"))

    harr = F.transform(F.split(normalize_text(F.col(text_col)), " "), lambda t: F.xxhash64(t))
    return df.select(F.col(id_col), sim(harr).alias("simhash"))


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_threshold: int = 3,
    bits: int = 64,
    num_bands: int = 4,
) -> DataFrame:
    """Near-dup removal by SimHash: band the fingerprint into num_bands bit
    slices (pigeonhole: any pair within hamming_threshold < num_bands shares
    a band), join candidates, verify hamming distance."""
    if hamming_threshold >= num_bands:
        # the pigeonhole guarantee needs threshold < num_bands: a pair
        # differing in exactly `num_bands` bits spread one-per-slice
        # shares NO band and is silently never a candidate
        raise ValueError(
            f"simhash_dedup: hamming_threshold={hamming_threshold} must "
            f"be < num_bands={num_bands} (pigeonhole recall guarantee)"
        )
    # pinned: both sides of the slice self-join read it.
    # localCheckpoint, not persist — a persist here leaks one
    # session-lifetime cacheManager entry per call (the minhash_dedup
    # lesson at _source_is_cached's comment)
    sh = simhash(df, text_col, id_col, bits).localCheckpoint(eager=True)
    width = bits // num_bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("slice"),
        )
        for b in range(num_bands)
    ]
    slices = sh.select(
        id_col, "simhash", F.explode(F.array(*band_structs)).alias("bx")
    ).select(id_col, "simhash", "bx.band", "bx.slice")
    l, r = slices.alias("l"), slices.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.slice") == F.col("r.slice"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= hamming_threshold)
    )
    losers = cand.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------
def embedding_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Near-dup by cosine similarity: LSH (random-hyperplane) buckets limit
    the pair space, exact cosine verifies. Deterministic hyperplanes.
    ``dim`` is the embedding dimension (inferred from the first row when
    None) — hyperplanes of the wrong width would NULL out every dot
    product and silently collapse all rows into bucket 0, degrading the
    bucketed join to the full O(n^2) pair space."""
    from fluent_bit_spark.extensions.similarity import cosine, hyperplane_bucket

    if dim is None:
        # probe only non-null vectors: a NULL first row would yield
        # dim=None and fail _hyperplanes with an opaque TypeError
        row = (
            emb.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("n"))
            .limit(1)
            .collect()
        )
        n = row[0].n if row else None
        dim = n if n is not None and n > 0 else 64
    # not persisted: the bucket projection is cheap to recompute and
    # caching the vectors measured slower than AQE exchange reuse
    b = emb.withColumn(
        "__bkt",
        hyperplane_bucket(F.col(vec_col), dim=dim, nbits=nbits, seed=seed),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.__bkt") == F.col("r.__bkt")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return emb.join(losers, id_col, "left_anti")


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 16,
    eps: float = 0.95,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    removal via k-means clustering + within-cluster cosine pruning.

    Each vector joins its nearest centroid's cluster; within a cluster,
    vectors are ordered by (cosine-to-centroid ASC, id) — the paper keeps
    the LOW centroid-similarity member of a duplicate group, preserving
    cluster-edge diversity — and a vector is dropped when any
    earlier-ordered clustermate has cosine >= eps to it (the paper's
    triangular-max scan, expressed as one self-join instead of a loop).

    Scale shape: the centroid table is the only driver state (k x dim —
    model-sized); assignment is a broadcast join; the pair space is
    within-cluster only, so the self-join shuffles on the cluster id and
    costs sum(m_c^2) instead of N^2 — pick n_clusters ~ N/target_cluster
    size exactly as the paper does (they run k ~ 10^4-10^5 at web scale).
    Unbalanced clusters are AQE skew-join territory; the deterministic
    k-means init keeps the layout reproducible run-to-run.

    Returns the KEPT rows of ``emb`` (same schema).
    """
    from fluent_bit_spark.extensions.similarity import cosine, kmeans_centroids

    cents = kmeans_centroids(emb, n_clusters, iters, id_col, vec_col)
    spark = emb.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            ["cid", "cvec"],
        )
    )
    from pyspark.sql import Window

    assigned = (
        emb.crossJoin(cdf)
        .select(
            id_col, vec_col, "cid",
            cosine(F.col(vec_col), F.col("cvec")).alias("ccos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    l, r = assigned.alias("l"), assigned.alias("r")
    earlier = (F.col("l.ccos") < F.col("r.ccos")) | (
        (F.col("l.ccos") == F.col("r.ccos")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    )
    dropped = (
        l.join(r, (F.col("l.cid") == F.col("r.cid")) & earlier)
        .filter(cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")) >= eps)
        .select(F.col(f"r.{id_col}").alias(id_col))
        .distinct()
    )
    return emb.join(dropped, id_col, "left_anti")
