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

Crash semantics, layout v1 (default): each bucket swap is atomic
(backup-and-rename), the set of swaps is not one transaction — a crash
mid-publish leaves some buckets at the new version and some at the
old. The merge is idempotent by construction (upsert keyed on the
merge key; deletes are anti-joins), so recovery is "re-run the same
increment": every bucket converges to the same state.

Layout v2 (``write_bucketed(..., atomic=True)``) closes that window
for plain parquet: bucket data lives in versioned ``bucket_<K>_v<gen>``
dirs, and a rename-committed ``_manifest_<gen>.json`` is the single
pointer that publishes a generation. A merge writes all touched
buckets' new dirs first (unreferenced, invisible), then flips the
pointer once — readers racing the merge resolve one committed
generation, old or new, never a mix; a crash before the commit leaves
the old generation fully intact. The previous generation's dirs are
retained for in-flight readers and GC'd a generation later. The
trade: v2 roots are not raw-readable with ``spark.read.parquet(path)``
— go through ``read_bucketed``. The Delta-backed path
(operators/delta_merge) remains the choice where delta is installed.

Reads stay one-call: ``spark.read.parquet(path)`` discovers the bucket
column as a normal Hive partition (``read_bucketed`` drops it). The
bucket id is ``pmod(hash(keys), n_buckets)`` — Spark's Murmur3, the
same function Spark's managed bucketing uses. Note the limit: a plain
parquet scan cannot REPORT that partitioning to Catalyst (only
saveAsTable bucketing or a JVM DataSource V2 can), so a join of two
identically-bucketed destinations still plans a shuffle. What equal
specs DO buy: maintenance and reconciliation can process bucket PAIRS
independently (diff/checksum/merge one bucket at a time, each pair a
small self-contained job), and any per-bucket operator (partial_merge,
read_buckets_for_keys, compact_buckets) lines up one-to-one across the
two tables. For genuinely Exchange-free recurring joins, write through
operators/partitioning.write_bucketed (saveAsTable bucketing,
plan-asserted shuffle-free in tests).
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
    replace_text_file,
    write_text_file,
)

BUCKET_COL = "__fe_bucket"
SPEC_FILE = "_bucket_spec.json"
SPEC_VERSION = 1
# Layout v2: versioned bucket dirs + a rename-committed manifest pointer
# (cross-bucket ATOMIC publish — readers see one generation, never a mix)
SPEC_VERSION_ATOMIC = 2
MANIFEST_PREFIX = "_manifest_"


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
    if spec.get("version") not in (SPEC_VERSION, SPEC_VERSION_ATOMIC):
        raise ValueError(f"unsupported bucket spec version: {spec.get('version')}")
    return spec


# --- layout v2: manifest-committed generations ---------------------------


def _manifest_gens(fs, path_cls, base: str) -> list[int]:
    """Committed manifest generations, ascending (metadata listing)."""
    if not fs.exists(path_cls(base)):
        return []
    gens = []
    for s in fs.listStatus(path_cls(base)):
        name = s.getPath().getName()
        if name.startswith(MANIFEST_PREFIX) and name.endswith(".json"):
            try:
                gens.append(int(name[len(MANIFEST_PREFIX) : -len(".json")]))
            except ValueError:
                continue
    return sorted(gens)


def read_manifest(spark: SparkSession, path: str) -> dict | None:
    """Latest committed manifest of a v2 destination:
    {"gen": N, "buckets": {bucket_id: dir_name}} — the one pointer that
    defines which physical dirs are live. None when no manifest exists."""
    fs, path_cls = hadoop_fs(spark, path)
    base = path.rstrip("/")
    gens = _manifest_gens(fs, path_cls, base)
    if not gens:
        return None
    text = read_text_file(spark, f"{base}/{MANIFEST_PREFIX}{gens[-1]}.json")
    m = json.loads(text)
    m["buckets"] = {int(k): v for k, v in m["buckets"].items()}
    if "shards" in m:
        m["shards"] = {int(k): int(v) for k, v in m["shards"].items()}
    if "n_shards" in m:
        m["n_shards"] = int(m["n_shards"])
    return m


def _commit_manifest(
    spark: SparkSession,
    path: str,
    gen: int,
    buckets: dict[int, str],
    shards: dict[int, int] | None = None,
    n_shards: int | None = None,
) -> None:
    """THE atomic publish step: write the manifest to a hidden tmp name,
    then rename onto `_manifest_<gen>.json` (rename-to-new-name is
    atomic on HDFS/POSIX). A reader lists committed manifests and takes
    the highest generation, so at every instant it resolves either the
    old pointer or the new one — never a partially-published state.

    ``shards`` (sharded destinations only) is the bucket -> rendezvous
    shard placement map — per-bucket provenance carried on every
    generation so a reader/mover always knows which shard owns which
    bucket dirs as of this gen. ``n_shards`` rides along as the ring
    size the map was computed for: the MANIFEST is the source of truth
    for shard placement (it commits atomically with the data pointer),
    the spec file is a convenience mirror refreshed after commit."""
    fs, path_cls = hadoop_fs(spark, path)
    base = path.rstrip("/")
    tmp = f"{base}/.{MANIFEST_PREFIX}{gen}.json.tmp"
    final = f"{base}/{MANIFEST_PREFIX}{gen}.json"
    m: dict = {"gen": gen, "buckets": {str(k): v for k, v in buckets.items()}}
    if shards is not None:
        m["shards"] = {str(k): int(v) for k, v in shards.items()}
    if n_shards is not None:
        m["n_shards"] = int(n_shards)
    write_text_file(
        spark,
        tmp,
        json.dumps(m),
    )
    if not fs.rename(path_cls(tmp), path_cls(final)):
        fs.delete(path_cls(tmp), False)
        raise IOError(
            f"could not commit {final} (a concurrent merge may have won the race)"
        )


def _gc_generations(spark: SparkSession, path: str, keep_gens: int = 2) -> None:
    """Drop bucket dirs and manifests no longer referenced by the newest
    ``keep_gens`` manifests. The previous generation is retained so a
    reader that resolved the old pointer just before a flip can still
    open its files; anything older is dead."""
    fs, path_cls = hadoop_fs(spark, path)
    base = path.rstrip("/")
    gens = _manifest_gens(fs, path_cls, base)
    live_dirs: set[str] = set()
    for g in gens[-keep_gens:]:
        text = read_text_file(spark, f"{base}/{MANIFEST_PREFIX}{g}.json")
        live_dirs |= set(json.loads(text)["buckets"].values())
    for g in gens[:-keep_gens]:
        fs.delete(path_cls(f"{base}/{MANIFEST_PREFIX}{g}.json"), False)
    for s in fs.listStatus(path_cls(base)):
        name = s.getPath().getName()
        if s.isDirectory() and name.startswith("bucket_") and name not in live_dirs:
            fs.delete(s.getPath(), True)


def write_bucketed(
    df: DataFrame,
    path: str,
    keys: list[str],
    n_buckets: int,
    atomic: bool = False,
    one_file_per_bucket: bool = False,
    keep_gens: int = 2,
    n_shards: int | None = None,
) -> None:
    """Initial full load of a bucketed destination: write all N buckets
    (one shuffle-free partitionBy job) and commit the spec file last, so
    a half-written initial load is never mistaken for a valid bucketed
    destination.

    ``atomic=True`` selects layout v2: bucket data lives in versioned
    ``bucket_<K>_v<gen>`` dirs and a rename-committed manifest file is
    the single pointer that publishes a generation. Merges then flip
    ALL touched buckets in one pointer commit — a reader racing a merge
    sees the old generation or the new one, never a mix (v1's
    per-bucket swaps are each atomic but not jointly). v2 trades away
    raw ``spark.read.parquet(path)`` root reads — go through
    ``read_bucketed`` — so v1 stays the default.

    ``one_file_per_bucket=True`` adds a repartition on the bucket id
    before the write, so each bucket lands as one file instead of one
    per upstream task (up to shuffle_partitions files per bucket).
    Right for append-maintained destinations (the persistent dedup
    indexes): a clean baseline means the append auto-compaction
    threshold tracks genuine growth, not initial-load fragmentation.
    Leave False for very large initial loads where a 10-50 GB bucket
    should not funnel through a single write task.

    ``keep_gens`` (v2 only, recorded in the spec) is the GC retention
    window: merge-time GC keeps the newest N generations' manifests and
    dirs. 2 = current + previous (enough for in-flight readers and a
    one-step ``rollback_bucketed``); raise it on destinations that need
    deeper undo/time-travel, at the cost of retaining old bucket dirs.

    ``n_shards`` (v2 only) adds the rendezvous shard layer: every bucket
    is assigned to a shard via HRW hashing (``_hrw_shard``) and the
    placement map rides on each manifest. Shards are the PLACEMENT
    unit (which storage node / stateful worker owns which buckets);
    buckets stay the merge-I/O unit. ``reshard_bucketed`` grows or
    shrinks the shard count while moving only the ~1/N of rows whose
    HRW assignment changes."""
    if n_shards is not None and not atomic:
        raise ValueError(
            "n_shards requires the atomic (v2) layout — the shard map "
            "rides on manifests (write_bucketed(..., atomic=True))"
        )
    if n_shards is not None and n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    spark = df.sparkSession
    out = df.withColumn(BUCKET_COL, bucket_id(keys, n_buckets))
    if one_file_per_bucket:
        out = out.repartition(n_buckets, F.col(BUCKET_COL))
    if not atomic:
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
        write_text_file(
            spark,
            _spec_path(path),
            json.dumps(
                {"version": SPEC_VERSION, "keys": list(keys), "n_buckets": int(n_buckets)}
            ),
        )
        return
    fs, path_cls = hadoop_fs(spark, path)
    base = path.rstrip("/")
    staging = base + ".__init_staging__"
    if fs.exists(path_cls(staging)):
        fs.delete(path_cls(staging), True)
    out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
    gen = 1
    buckets: dict[int, str] = {}
    for s in hadoop_fs(spark, staging)[0].listStatus(path_cls(staging)):
        name = s.getPath().getName()
        if not (s.isDirectory() and name.startswith(f"{BUCKET_COL}=")):
            continue
        b = int(name.split("=", 1)[1])
        dirname = f"bucket_{b}_v{gen}"
        fs.mkdirs(path_cls(base))
        if not fs.rename(s.getPath(), path_cls(f"{base}/{dirname}")):
            raise IOError(f"could not place {dirname} under {base}")
        buckets[b] = dirname
    if not buckets:
        # zero-row initial load: keep one schema-bearing empty bucket
        empty = df.sparkSession.createDataFrame([], df.schema)
        empty.write.mode("overwrite").parquet(f"{base}/bucket_0_v{gen}")
        buckets[0] = f"bucket_0_v{gen}"
    fs.delete(path_cls(staging), True)
    shards = (
        {b: _hrw_shard(b, n_shards) for b in range(n_buckets)}
        if n_shards is not None
        else None
    )
    _commit_manifest(spark, path, gen, buckets, shards=shards, n_shards=n_shards)
    spec: dict = {
        "version": SPEC_VERSION_ATOMIC,
        "keys": list(keys),
        "n_buckets": int(n_buckets),
        "keep_gens": int(keep_gens),
    }
    if n_shards is not None:
        spec["n_shards"] = int(n_shards)
    write_text_file(spark, _spec_path(path), json.dumps(spec))


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucketed destination as plain rows (bucket column dropped).
    v2 resolves the latest committed manifest — one consistent
    generation, even while a merge publishes. Filters on the merge key
    do NOT prune buckets automatically (the hash is opaque to
    Catalyst); use ``read_buckets_for_keys`` for point lookups."""
    spec = read_bucket_spec(spark, path)
    # The manifest, not the spec, decides whether this is a v2 root: a
    # crash (or the atomic spec swap's delete/rename window) can leave
    # the spec briefly ABSENT while manifests exist — falling through to
    # the raw v1 read would then scan EVERY retained generation's bucket
    # dirs and silently return duplicated rows.
    m = (
        read_manifest(spark, path)
        if spec is None or spec["version"] == SPEC_VERSION_ATOMIC
        else None
    )
    if m is not None:
        base = path.rstrip("/")
        dirs = [f"{base}/{d}" for d in m["buckets"].values()]
        return spark.read.parquet(*dirs)
    if spec is not None and spec["version"] == SPEC_VERSION_ATOMIC:
        raise IOError(
            f"{path} has a v2 bucket spec but no committed manifest — "
            "the destination was never published or is corrupt"
        )
    return spark.read.parquet(path).drop(BUCKET_COL)


def list_generations(spark: SparkSession, path: str) -> list[int]:
    """Committed manifest generations of a v2 destination, ascending.
    Empty for v1 destinations (no manifests)."""
    fs, path_cls = hadoop_fs(spark, path)
    return _manifest_gens(fs, path_cls, path.rstrip("/"))


def _read_manifest_gen(spark: SparkSession, path: str, gen: int) -> dict:
    base = path.rstrip("/")
    text = read_text_file(spark, f"{base}/{MANIFEST_PREFIX}{gen}.json")
    if text is None:
        raise ValueError(
            f"generation {gen} of {path} has no manifest (never committed, "
            f"or GC'd past the keep_gens window); available: "
            f"{list_generations(spark, path)}"
        )
    m = json.loads(text)
    m["buckets"] = {int(k): v for k, v in m["buckets"].items()}
    if "shards" in m:
        m["shards"] = {int(k): int(v) for k, v in m["shards"].items()}
    if "n_shards" in m:
        m["n_shards"] = int(m["n_shards"])
    return m


def read_bucketed_at(spark: SparkSession, path: str, gen: int) -> DataFrame:
    """Time-travel read of a v2 destination: resolve generation ``gen``'s
    manifest instead of the latest. Only generations inside the GC
    retention window (``keep_gens``, default 2) still have their bucket
    dirs on disk; older gens raise here."""
    m = _read_manifest_gen(spark, path, gen)
    base = path.rstrip("/")
    fs, path_cls = hadoop_fs(spark, path)
    missing = [d for d in m["buckets"].values() if not fs.exists(path_cls(f"{base}/{d}"))]
    if missing:
        raise ValueError(
            f"generation {gen} of {path} is no longer readable: bucket dirs "
            f"{missing[:3]}{'...' if len(missing) > 3 else ''} were GC'd "
            "(outside the keep_gens retention window)"
        )
    return spark.read.parquet(*[f"{base}/{d}" for d in m["buckets"].values()])


def rollback_bucketed(spark: SparkSession, path: str, to_gen: int | None = None) -> int:
    """Roll a v2 destination back to an earlier generation by committing
    a NEW manifest that points at the old generation's bucket dirs —
    the undo is itself an atomic pointer flip, so readers see the
    pre-rollback or post-rollback state, never a mix, and the forward
    history (one manifest per publish) stays intact for audit.

    ``to_gen`` defaults to the generation before the current one (undo
    the last merge). Returns the NEW generation number. Raises if the
    target's bucket dirs were already GC'd, or if a concurrent merge
    holds the destination lock. This is the plain-parquet twin of Delta's
    RESTORE; with delta installed, prefer the transactional path."""
    spec = read_bucket_spec(spark, path)
    if spec is None or spec["version"] != SPEC_VERSION_ATOMIC:
        raise ValueError(
            f"{path} is not an atomic (v2) bucketed destination — rollback "
            "needs the manifest-committed layout (write_bucketed(..., atomic=True))"
        )
    fs, path_cls = hadoop_fs(spark, path)
    lock = path_cls(path.rstrip("/") + ".__merge_lock__")
    if not fs.createNewFile(lock):
        raise RuntimeError(
            f"another merge holds {lock}: rollback racing a merge is rejected"
        )
    try:
        gens = list_generations(spark, path)
        if len(gens) < 2 and to_gen is None:
            raise ValueError(f"{path} has no earlier generation to roll back to")
        target = gens[-2] if to_gen is None else to_gen
        if target not in gens:
            raise ValueError(f"generation {target} not in committed history {gens}")
        m = _read_manifest_gen(spark, path, target)
        base = path.rstrip("/")
        missing = [
            d for d in m["buckets"].values() if not fs.exists(path_cls(f"{base}/{d}"))
        ]
        if missing:
            raise ValueError(
                f"cannot roll back {path} to gen {target}: bucket dirs "
                f"{missing[:3]}{'...' if len(missing) > 3 else ''} were GC'd"
            )
        new_gen = gens[-1] + 1
        _commit_manifest(spark, path, new_gen, m["buckets"], shards=m.get("shards"))
        return new_gen
    finally:
        fs.delete(lock, False)


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
    if spec["version"] == SPEC_VERSION_ATOMIC:
        m = read_manifest(spark, path)
        base = path.rstrip("/")
        dirs = [f"{base}/{m['buckets'][b]}" for b in touched if b in m["buckets"]]
        if not dirs:
            return read_bucketed(spark, path).limit(0)
        dest = spark.read.parquet(*dirs)
        return dest.join(keys_df.select(*keys), on=keys, how="left_semi")
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
        if spec["version"] == SPEC_VERSION_ATOMIC:
            return _partial_merge_locked_v2(
                spark, path, increment, deleted_keys, keys, n_buckets
            )
        return _partial_merge_locked(
            spark, path, increment, deleted_keys, keys, n_buckets
        )
    finally:
        lock_fs.delete(lock, False)


def _partial_merge_locked_v2(
    spark: SparkSession,
    path: str,
    increment: DataFrame,
    deleted_keys: DataFrame | None,
    keys: list[str],
    n_buckets: int,
) -> dict:
    """v2 merge: write the touched buckets' NEW versions as fresh
    ``bucket_<K>_v<gen+1>`` dirs (invisible — nothing references them),
    then publish every touched bucket at once with ONE manifest
    rename-commit. A crash before the commit leaves the destination
    exactly at the old generation (orphan dirs are overwritten by the
    re-run and collected by generation GC); a crash after the commit IS
    the new state. Readers racing the merge resolve one committed
    manifest — old or new, never mixed."""
    from fastetl_spark.operators.sync import delete_sync, merge_upsert

    m = read_manifest(spark, path)
    gen, old_buckets = m["gen"], dict(m["buckets"])
    next_gen = gen + 1
    base = path.rstrip("/")
    fs, path_cls = hadoop_fs(spark, path)

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

    live_touched = [f"{base}/{old_buckets[b]}" for b in touched_ids if b in old_buckets]
    if live_touched:
        dest = spark.read.parquet(*live_touched)
        merged = merge_upsert(dest, inc.drop(BUCKET_COL).select(*dest.columns), keys)
    else:
        merged = inc.drop(BUCKET_COL)
    if dels is not None:
        merged = delete_sync(merged, dels.select(*keys), keys)

    staging = base + ".__merge_staging__"
    if fs.exists(path_cls(staging)):
        fs.delete(path_cls(staging), True)
    from pyspark.sql import Observation

    obs = Observation()
    out = merged.observe(obs, F.count(F.lit(1)).alias("n_rows")).withColumn(
        BUCKET_COL, bucket_id(keys, n_buckets)
    )
    out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
    rows_written = int(obs.get["n_rows"])

    new_buckets = {b: d for b, d in old_buckets.items() if b not in touched}
    for b in touched_ids:
        src = path_cls(f"{staging}/{BUCKET_COL}={b}")
        if not fs.exists(src):
            continue  # bucket emptied: simply not referenced anymore
        dirname = f"bucket_{b}_v{next_gen}"
        dst = path_cls(f"{base}/{dirname}")
        if fs.exists(dst):  # orphan from a crashed previous attempt
            fs.delete(dst, True)
        if not fs.rename(src, dst):
            raise IOError(f"could not place {dirname} under {base}")
        new_buckets[b] = dirname
    fs.delete(path_cls(staging), True)
    if not new_buckets:
        # destination fully emptied: keep one schema-bearing empty dir
        dirname = f"bucket_0_v{next_gen}"
        empty = spark.createDataFrame([], merged.schema)
        empty.write.mode("overwrite").parquet(f"{base}/{dirname}")
        new_buckets[0] = dirname
    _commit_manifest(spark, path, next_gen, new_buckets, shards=m.get("shards"))
    spec = read_bucket_spec(spark, path) or {}
    _gc_generations(spark, path, keep_gens=int(spec.get("keep_gens", 2)))
    return {
        "n_buckets": n_buckets,
        "buckets_touched": len(touched_ids),
        "rows_written": rows_written,
    }


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


def advise_n_buckets(
    spark: SparkSession,
    path: str,
    target_bucket_bytes: int = 32 << 30,
    power_of_two: bool = True,
) -> int:
    """Recommend a bucket count for migrating `path` to the bucketed
    layout: ceil(on-disk bytes / target), optionally rounded UP to a
    power of two. One filesystem content-summary call — no data scan.

    The default 32 GiB target sits in the RUNBOOK's 10-50 GB band
    (one bucket ≈ one comfortable merge task's working set). Note the
    measure is COMPRESSED parquet bytes — if downstream processing
    explodes rows (arrays, joins), size the target down accordingly.
    Power-of-two counts are a convention, not a requirement; two
    destinations only join bucket-to-bucket when their counts are
    EQUAL, so standardizing on powers of two makes accidental
    co-location matches more likely across tables."""
    import math

    fs, path_cls = hadoop_fs(spark, path)
    total = fs.getContentSummary(path_cls(path.rstrip("/"))).getLength()
    n = max(1, math.ceil(total / target_bucket_bytes))
    if power_of_two:
        n = 1 << (n - 1).bit_length()
    return n


# --- rendezvous shard layer -----------------------------------------------
#
# Shards are the PLACEMENT unit layered over the hash buckets: each
# bucket is owned by the shard that wins its rendezvous (HRW, Thaler &
# Ravishankar 1996). Rows never change buckets (pmod(hash) is fixed for
# the store's lifetime), so a shard-count change moves whole buckets —
# and HRW guarantees only ~1/new_n of buckets (hence ~1/new_n of ROWS)
# change owner, vs ~(n-1)/n under modulo placement. On a cluster the
# moved buckets are the only data that crosses the network; here the
# move is a physical copy into new-generation dirs so the migration
# cost is measured, not waved off. The weight is the same md5-portable
# form operators/partitioning.rendezvous_shard uses for row-level
# sharding (cross-checked in tests), so engine and store agree on
# placement.


def _hrw_shard(bucket: int, n_shards: int) -> int:
    """Rendezvous shard of a bucket id: argmax over shards of the
    64-bit-safe md5 weight of f"{bucket}#{shard}", ties to the lower
    shard id — the driver-side twin of partitioning.rendezvous_shard."""
    import hashlib

    def w(s: int) -> int:
        return int(
            hashlib.md5(f"{bucket}#{s}".encode()).hexdigest()[:15], 16
        )

    return max(range(n_shards), key=lambda s: (w(s), -s))


def shard_map(spark: SparkSession, path: str) -> dict[int, int]:
    """Current bucket -> shard placement of a sharded v2 destination
    (from the latest manifest)."""
    m = read_manifest(spark, path)
    if m is None or "shards" not in m:
        raise ValueError(
            f"{path} has no shard layer — create with "
            "write_bucketed(..., atomic=True, n_shards=N) or run "
            "reshard_bucketed once to initialize placement"
        )
    return m["shards"]


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard's rows (bucket dirs owned by `shard` in the latest
    manifest) — the per-worker view a sharded stateful consumer reads.
    Empty-but-typed frame when the shard owns no populated bucket.
    Dirs and placement come from ONE manifest read — re-resolving the
    placement separately could tear across a racing reshard commit
    (gen-N dirs paired with gen-N+1 ownership = a bucket served to two
    workers)."""
    m = read_manifest(spark, path)
    if m is None or "shards" not in m:
        raise ValueError(
            f"{path} has no shard layer — create with "
            "write_bucketed(..., atomic=True, n_shards=N) or run "
            "reshard_bucketed once to initialize placement"
        )
    shards = m["shards"]
    base = path.rstrip("/")
    dirs = [
        f"{base}/{d}"
        for b, d in m["buckets"].items()
        if shards.get(b) == shard
    ]
    if not dirs:
        return read_bucketed(spark, path).limit(0)
    return spark.read.parquet(*dirs)


def reshard_bucketed(
    spark: SparkSession, path: str, new_n_shards: int
) -> dict:
    """Online reshard of a v2 destination to ``new_n_shards`` rendezvous
    shards, moving ONLY the buckets whose HRW owner changes.

    Mechanics: recompute the HRW winner of every bucket under the new
    shard count (driver-side, n_buckets bounded ints), physically copy
    just the MOVED buckets into fresh ``bucket_<K>_v<gen+1>`` dirs (on a
    cluster this copy is the actual data migration; unmoved buckets'
    dirs are re-referenced untouched — zero I/O), then publish the new
    placement map + dir set with ONE manifest commit. Readers racing
    the reshard resolve a complete old or new generation, and
    ``rollback_bucketed`` undoes the flip like any other publish.

    Growing n -> m only ever moves buckets TO the new shards n..m-1
    (surviving shards' relative rendezvous order is unchanged), so
    expected moved volume is ~(m-n)/m of the store — the stable-
    resharding property modulo placement lacks.

    Initializing: on a store written without ``n_shards`` this records
    the first placement map without copying anything (nothing was
    placed before, so nothing moves).

    Returns {"gen", "old_n_shards", "new_n_shards", "n_buckets",
    "buckets_moved", "rows_moved", "rows_total"}."""
    spec = read_bucket_spec(spark, path)
    if spec is None or spec["version"] != SPEC_VERSION_ATOMIC:
        raise ValueError(
            f"{path} is not an atomic (v2) bucketed destination — the "
            "shard layer needs manifest-committed generations "
            "(write_bucketed(..., atomic=True))"
        )
    if new_n_shards < 1:
        raise ValueError(f"new_n_shards must be >= 1, got {new_n_shards}")
    fs, path_cls = hadoop_fs(spark, path)
    base = path.rstrip("/")
    lock = path_cls(base + ".__merge_lock__")
    if not fs.createNewFile(lock):
        raise RuntimeError(
            f"another merge holds {lock}: resharding racing a merge is rejected"
        )
    try:
        m = read_manifest(spark, path)
        n_buckets = int(spec["n_buckets"])
        old_shards = m.get("shards")
        # the MANIFEST is the source of truth for the prior ring size
        # (it commits atomically with the placement map); the spec is a
        # mirror refreshed AFTER commit and can be one step stale if a
        # previous reshard crashed between the two writes
        old_n = int(m.get("n_shards") or spec.get("n_shards") or 0)
        new_shards = {b: _hrw_shard(b, new_n_shards) for b in range(n_buckets)}
        moved = (
            sorted(
                b
                for b in m["buckets"]
                if old_shards.get(b) != new_shards[b]
            )
            if old_shards is not None
            else []  # first placement: nothing was placed, nothing moves
        )
        next_gen = m["gen"] + 1
        new_buckets = dict(m["buckets"])
        rows_moved = 0
        for b in moved:
            src = f"{base}/{m['buckets'][b]}"
            dirname = f"bucket_{b}_v{next_gen}"
            dst = f"{base}/{dirname}"
            dst_p = path_cls(dst)
            if fs.exists(dst_p):  # orphan from a crashed previous attempt
                fs.delete(dst_p, True)
            df = spark.read.parquet(src)
            rows_moved += df.count()  # parquet footer metadata only
            df.write.mode("overwrite").parquet(dst)
            new_buckets[b] = dirname
        rows_total = 0
        if m["buckets"]:
            rows_total = spark.read.parquet(
                *[f"{base}/{d}" for d in m["buckets"].values()]
            ).count()
        _commit_manifest(
            spark, path, next_gen, new_buckets,
            shards=new_shards, n_shards=int(new_n_shards),
        )
        spec["n_shards"] = int(new_n_shards)
        replace_text_file(spark, _spec_path(path), json.dumps(spec))
        _gc_generations(spark, path, keep_gens=int(spec.get("keep_gens", 2)))
        return {
            "gen": next_gen,
            "old_n_shards": old_n,
            "new_n_shards": int(new_n_shards),
            "n_buckets": n_buckets,
            "buckets_moved": len(moved),
            "rows_moved": int(rows_moved),
            "rows_total": int(rows_total),
        }
    finally:
        fs.delete(lock, False)


def bucketize(
    spark: SparkSession,
    path: str,
    keys: list[str],
    n_buckets: int,
    atomic: bool = False,
    keep_gens: int = 2,
) -> None:
    """Migrate an existing plain-parquet destination to the bucketed
    layout (one full rewrite — the last one it will need). Staged to a
    sibling directory and swapped, so the migration never caches the
    destination and readers never see a partial layout. ``atomic=True``
    migrates to layout v2 (manifest-committed generations; ``keep_gens``
    sets the GC retention window for rollback/time-travel)."""
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".__bucketize_staging__"
    fs, path_cls = hadoop_fs(spark, path)
    if fs.exists(path_cls(staging)):
        fs.delete(path_cls(staging), True)
    write_bucketed(df, staging, keys, n_buckets, atomic=atomic, keep_gens=keep_gens)
    replace_dir(fs, path_cls, staging, path.rstrip("/"))
