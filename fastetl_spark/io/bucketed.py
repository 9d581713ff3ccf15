"""Key-bucketed parquet destination: partial MERGE without a table format.

The plain-parquet incremental sync (SURVEY §2.9; reference
fast_etl.py:454-652) had one remaining O(|destination|)-per-increment
cost: every merge read AND rewrote the whole destination. The reference
avoids that by doing UPDATE/INSERT inside the destination database
(fast_etl.py:601-610); a lakehouse avoids it with a Delta MERGE's
file-level pruning. This module is the plain-parquet equivalent:

- the destination is laid out as N independent hash-buckets of the
  merge key (``path/__fe_bucket=K/`` Hive-style subdirectories, one
  parquet directory each, plus a ``_bucket_spec.json`` control file);
- a merge computes the increment's touched bucket set (≤ N small ints
  — a bounded, documented driver value, not a data collect), reads
  ONLY those buckets, merges, and atomically swaps each touched bucket
  directory;
- untouched buckets are never opened, so merge cost is
  O(|increment| + |touched buckets|), and a point increment into a
  4096-bucket 100 TB destination rewrites ~25 GB, not 100 TB.

Crash semantics: each bucket swap is atomic (backup-and-rename), the
set of swaps is not one transaction — a crash mid-publish leaves some
buckets at the new version and some at the old. The merge is
idempotent by construction (upsert keyed on the merge key; deletes are
anti-joins), so recovery is "re-run the same increment": every bucket
converges to the same state. For cross-bucket atomicity use the
Delta-backed path when `delta` is importable (operators/delta_merge).

Reads stay one-call: ``spark.read.parquet(path)`` discovers the bucket
column as a normal Hive partition (``read_bucketed`` drops it). The
bucket id is ``pmod(hash(keys), n_buckets)`` — Spark's Murmur3 — so
the layout also serves as a co-location hint: two destinations
bucketed the same way join bucket-to-bucket without a full shuffle.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.fsutil import (
    hadoop_fs,
    read_text_file,
    replace_dir,
    write_text_file,
)

BUCKET_COL = "__fe_bucket"
SPEC_FILE = "_bucket_spec.json"
SPEC_VERSION = 1


def bucket_id(keys: list[str], n_buckets: int) -> Column:
    """Bucket id of a row: pmod(murmur3(keys), n). Stable for a given
    Spark major version; the spec file pins n so every writer agrees."""
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(int(n_buckets)))


def _spec_path(path: str) -> str:
    return path.rstrip("/") + "/" + SPEC_FILE


def read_bucket_spec(spark: SparkSession, path: str) -> dict | None:
    """The destination's bucket spec, or None when ``path`` is not a
    bucketed destination."""
    text = read_text_file(spark, _spec_path(path))
    if text is None:
        return None
    spec = json.loads(text)
    if spec.get("version") != SPEC_VERSION:
        raise ValueError(f"unsupported bucket spec version: {spec.get('version')}")
    return spec


def write_bucketed(
    df: DataFrame, path: str, keys: list[str], n_buckets: int
) -> None:
    """Initial full load of a bucketed destination: write all N buckets
    (one shuffle-free partitionBy job) and commit the spec file last, so
    a half-written initial load is never mistaken for a valid bucketed
    destination."""
    out = df.withColumn(BUCKET_COL, bucket_id(keys, n_buckets))
    out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
    write_text_file(
        df.sparkSession,
        _spec_path(path),
        json.dumps(
            {"version": SPEC_VERSION, "keys": list(keys), "n_buckets": int(n_buckets)}
        ),
    )


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucketed destination as plain rows (bucket column dropped).
    Filters on the merge key do NOT prune buckets automatically (the
    hash is opaque to Catalyst); use ``read_buckets_for_keys`` for
    point lookups."""
    return spark.read.parquet(path).drop(BUCKET_COL)


def read_buckets_for_keys(
    spark: SparkSession, path: str, keys_df: DataFrame
) -> DataFrame:
    """Point-lookup path: read only the buckets that could contain the
    given key rows, then semi-join down to exact matches. Turns a
    point query against a 100 TB destination into a scan of the few
    touched buckets."""
    spec = read_bucket_spec(spark, path)
    if spec is None:
        raise ValueError(f"{path} is not a bucketed destination")
    keys = spec["keys"]
    tagged = keys_df.withColumn(BUCKET_COL, bucket_id(keys, spec["n_buckets"]))
    touched = sorted(r[0] for r in tagged.select(BUCKET_COL).distinct().collect())
    existing = _existing_bucket_paths(spark, path, touched)
    if not existing:
        return read_bucketed(spark, path).limit(0)
    dest = spark.read.option("basePath", path).parquet(*existing)
    return dest.join(keys_df.select(*keys), on=keys, how="left_semi").drop(BUCKET_COL)


def _existing_bucket_paths(
    spark: SparkSession, path: str, bucket_ids: list[int]
) -> list[str]:
    fs, path_cls = hadoop_fs(spark, path)
    out = []
    for b in bucket_ids:
        p = f"{path.rstrip('/')}/{BUCKET_COL}={b}"
        if fs.exists(path_cls(p)):
            out.append(p)
    return out


def partial_merge(
    spark: SparkSession,
    path: str,
    increment: DataFrame,
    deleted_keys: DataFrame | None = None,
) -> dict:
    """Merge an increment into a bucketed destination, rewriting only
    the buckets the increment (or deletion feed) touches.

    Upsert semantics match operators/sync.merge_upsert (incoming rows
    win on key match, new keys append — reference fast_etl.py:437-451);
    deletions match delete_sync (anti-join retain). The increment must
    be key-unique (callers dedupe, as the streaming merge already does).

    Returns ``{"n_buckets": N, "buckets_touched": t, "rows_written": w}``.

    Concurrency: a lock file (``<path>.__merge_lock__``, atomic create)
    rejects a second merge on the same destination — two merges would
    fight over one staging directory and interleave bucket swaps. A
    crash leaves the lock behind; clear it with
    ``io.fsutil.vacuum_dest`` (or delete the file) once no merge runs.
    """
    spec = read_bucket_spec(spark, path)
    if spec is None:
        raise ValueError(
            f"{path} has no {SPEC_FILE}; initialize with write_bucketed() first"
        )
    keys, n_buckets = spec["keys"], spec["n_buckets"]

    lock_fs, lock_path_cls = hadoop_fs(spark, path)
    lock = lock_path_cls(path.rstrip("/") + ".__merge_lock__")
    if not lock_fs.createNewFile(lock):
        raise RuntimeError(
            f"another merge holds {lock}: concurrent merges on one "
            "destination are rejected (stale after a crash? clear it "
            "with io.fsutil.vacuum_dest)"
        )
    try:
        return _partial_merge_locked(
            spark, path, increment, deleted_keys, keys, n_buckets
        )
    finally:
        lock_fs.delete(lock, False)


def _partial_merge_locked(
    spark: SparkSession,
    path: str,
    increment: DataFrame,
    deleted_keys: DataFrame | None,
    keys: list[str],
    n_buckets: int,
) -> dict:
    from fastetl_spark.operators.sync import delete_sync, merge_upsert

    inc = increment.withColumn(BUCKET_COL, bucket_id(keys, n_buckets)).transform(
        materialize
    )
    touched = {r[0] for r in inc.select(BUCKET_COL).distinct().collect()}
    dels = None
    if deleted_keys is not None:
        dels = (
            deleted_keys.select(*keys)
            .withColumn(BUCKET_COL, bucket_id(keys, n_buckets))
            .transform(materialize)
        )
        touched |= {r[0] for r in dels.select(BUCKET_COL).distinct().collect()}
    touched_ids = sorted(touched)
    if not touched_ids:
        return {"n_buckets": n_buckets, "buckets_touched": 0, "rows_written": 0}

    existing = _existing_bucket_paths(spark, path, touched_ids)
    if existing:
        dest = spark.read.option("basePath", path).parquet(*existing)
        merged = merge_upsert(dest, inc.select(*dest.columns), keys)
    else:
        merged = inc
    if dels is not None:
        merged = delete_sync(merged, dels.select(*keys), keys)

    staging = path.rstrip("/") + ".__merge_staging__"
    fs, path_cls = hadoop_fs(spark, path)
    if fs.exists(path_cls(staging)):
        fs.delete(path_cls(staging), True)
    # row-count metric rides on the write itself (observe) — no second
    # job, and it stays correct when a delete empties every touched
    # bucket (an empty staging dir cannot be read back for a count)
    from pyspark.sql import Observation

    obs = Observation()
    merged = merged.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
    rows_written = int(obs.get["n_rows"])

    for b in touched_ids:
        src = f"{staging}/{BUCKET_COL}={b}"
        dst = f"{path.rstrip('/')}/{BUCKET_COL}={b}"
        if fs.exists(path_cls(src)):
            replace_dir(fs, path_cls, src, dst)
        elif fs.exists(path_cls(dst)):
            # every row of this bucket was deleted: the bucket dir goes away
            fs.delete(path_cls(dst), True)
    fs.delete(path_cls(staging), True)
    # a delete can empty the WHOLE destination; plain parquet cannot
    # express "zero rows, known schema" without a file, so keep one
    # schema-bearing empty file in bucket 0 — reads stay one-call
    remaining = [
        s
        for s in fs.listStatus(path_cls(path.rstrip("/")))
        if s.isDirectory() and s.getPath().getName().startswith(f"{BUCKET_COL}=")
    ]
    if not remaining:
        empty = spark.createDataFrame([], merged.drop(BUCKET_COL).schema)
        empty.write.mode("overwrite").parquet(f"{path.rstrip('/')}/{BUCKET_COL}=0")
    return {
        "n_buckets": n_buckets,
        "buckets_touched": len(touched_ids),
        "rows_written": int(rows_written),
    }


DEFAULT_MAX_FILES_PER_BUCKET = 16


def bucket_file_counts(
    spark: SparkSession, path: str, bucket_ids: list[int] | None = None
) -> dict[int, int]:
    """Data-file count per bucket directory (Hadoop listStatus — pure
    metadata, no data read). ``bucket_ids=None`` lists every bucket."""
    fs, path_cls = hadoop_fs(spark, path)
    base = path.rstrip("/")
    if bucket_ids is None:
        bucket_ids = [
            int(s.getPath().getName().split("=", 1)[1])
            for s in fs.listStatus(path_cls(base))
            if s.isDirectory() and s.getPath().getName().startswith(f"{BUCKET_COL}=")
        ]
    out: dict[int, int] = {}
    for b in sorted(set(bucket_ids)):
        p = path_cls(f"{base}/{BUCKET_COL}={b}")
        if not fs.exists(p):
            continue
        out[b] = sum(
            1
            for s in fs.listStatus(p)
            if not s.isDirectory()
            and not s.getPath().getName().startswith(("_", "."))
        )
    return out


def compact_buckets(
    spark: SparkSession,
    path: str,
    bucket_ids: list[int] | None = None,
    max_files: int = DEFAULT_MAX_FILES_PER_BUCKET,
    target_rows_per_file: int = 1_000_000,
) -> dict[int, int]:
    """Per-bucket small-file compaction for append-maintained bucketed
    destinations (the persistent dedup indexes append a few files per
    increment forever — without this, a year of daily batches turns the
    "read only touched buckets" win into a file-count-overhead loss).

    Only buckets whose data-file count EXCEEDS ``max_files`` are
    rewritten (one coalesce + atomic swap each, via io/writers
    atomic_overwrite); everything else is left untouched, so calling
    this after every append is cheap — the steady state is one no-op
    listStatus per touched bucket. Returns {bucket_id: file_count_after}
    for the buckets that were compacted."""
    from fastetl_spark.io.writers import atomic_overwrite

    base = path.rstrip("/")
    counts = bucket_file_counts(spark, path, bucket_ids)
    compacted: dict[int, int] = {}
    for b, n_files in counts.items():
        if n_files <= max_files:
            continue
        bdir = f"{base}/{BUCKET_COL}={b}"
        df = spark.read.parquet(bdir)
        n_rows = df.count()  # parquet footer metadata only
        k = max(1, -(-n_rows // target_rows_per_file))
        atomic_overwrite(df.coalesce(k), bdir)
        compacted[b] = bucket_file_counts(spark, path, [b])[b]
    return compacted


def bucketize(
    spark: SparkSession, path: str, keys: list[str], n_buckets: int
) -> None:
    """Migrate an existing plain-parquet destination to the bucketed
    layout (one full rewrite — the last one it will need). Staged to a
    sibling directory and swapped, so the migration never caches the
    destination and readers never see a partial layout."""
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".__bucketize_staging__"
    fs, path_cls = hadoop_fs(spark, path)
    if fs.exists(path_cls(staging)):
        fs.delete(path_cls(staging), True)
    write_bucketed(df, staging, keys, n_buckets)
    replace_dir(fs, path_cls, staging, path.rstrip("/"))
