"""Incremental execution: ordinal / content-hash skip + memoization +
exactly-once-style export.

Reference semantics reproduced (SURVEY §2.5):

- **Ordinal skip** (src/execution/row_indexer.rs:34-131): each source
  row carries a monotonic ordinal (mtime µs). A row is reprocessed
  only if its ordinal is newer than the tracked one, or equal with a
  changed logic fingerprint.
- **Content-hash short-circuit** (row_indexer.rs:506-587): if the
  source content hash is unchanged and the logic fingerprint is
  current, only the tracking ordinal is bumped — no recompute, no
  target writes.
- **Logic fingerprint** (analyzer.rs:1105-1108): flow-definition hash
  stored per row; change ⇒ full reprocess.
- **Deletion detection** (source_indexer.rs:298-393): keys present in
  tracking state but absent from a fresh listing ⇒ target delete.
- **Function memoization** (memoization.rs:17-233): expensive
  function results cached by (behavior_version, args-hash) and
  reused across reprocessing.

Spark-first shape: all of this is *set arithmetic over DataFrames* —
the skip decision is one full-outer join between the source listing
and the tracking table; the memo cache is a left join before the
expensive UDF and a union-back after. State lives in parquet
directories (at production scale: Delta/Iceberg tables so MERGE and
txn log replace the read-modify-write used here; the join logic is
identical).

Decision matrix (ported from the reference's row_indexer tests,
src/execution/row_indexer.rs:823-987 — see tests/test_incremental.py):

| listing vs tracking                | action       |
|------------------------------------|--------------|
| new key                            | process      |
| ordinal newer, content differs     | process      |
| ordinal newer, content same        | bump ordinal |
| ordinal equal, logic same          | skip         |
| ordinal equal, logic changed       | process      |
| ordinal older                      | skip (stale) |
| key gone from listing              | delete       |
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRACKING_COLS = ("_key", "_ordinal", "_content_hash", "_logic_fp", "_process_ordinal")


def content_hash(*cols) -> F.Column:
    """sha256 fingerprint of the row content (row_indexer.rs:506)."""
    return F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256)


class ParquetState:
    """Tiny parquet-backed state table (small states: stats, fixtures).

    Commits are versioned directories + an atomically-replaced pointer
    file — a crash at any point leaves the previous version readable
    (no rename window where the state dir doesn't exist). A Delta
    MERGE replaces this verbatim on a real deployment. For keyed state
    at scale use :class:`BucketedParquetState`, which rewrites only
    the buckets containing changed keys."""

    def __init__(self, spark: SparkSession, path: str, schema_ddl: str):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl

    def _pointer(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current(self) -> str | None:
        try:
            with open(self._pointer()) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame:
        cur = self._current()
        if cur is not None:
            return self.spark.read.parquet(os.path.join(self.path, cur))
        return self.spark.createDataFrame([], self.schema_ddl)

    def overwrite(self, df: DataFrame) -> None:
        os.makedirs(self.path, exist_ok=True)
        prev = self._current()
        seq = int(prev.split("_")[1]) + 1 if prev else 0
        vdir = f"v_{seq}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, vdir))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, self._pointer())  # single-rename commit
        if prev:
            shutil.rmtree(os.path.join(self.path, prev), ignore_errors=True)


class BucketedParquetState:
    """Key-hash-bucketed state with an optimistic-concurrency commit
    log — the scale-correct Delta/Iceberg-MERGE stand-in.

    Layout::

        path/MANIFEST.000000000007.json   {"seq": 7, "buckets": {"5": "gen_7_ab12cd34", ...}}
        path/gen_7_ab12cd34/_bucket=5/part-*.parquet

    Rows are partitioned by ``crc32(key) % n_buckets``. A merge
    rewrites ONLY the buckets containing changed keys into a fresh
    generation directory, then commits by claiming the next manifest
    sequence number with an atomic exclusive create (``os.link`` of a
    fully-written temp file — complete-content-or-nothing). A crash
    at any point leaves the previous manifest the newest consistent
    one. At 100 TB this is the difference between O(Δ) and O(state)
    I/O per incremental update; a real deployment swaps this class
    for ``MERGE INTO`` on a table bucketed by the same hash.

    **Multi-writer safe** (beyond the reference's per-flow
    single-writer source indexer, src/execution/source_indexer.rs) via
    the same protocol Delta's transaction log uses: writers race to
    create ``MANIFEST.{seq}.json``; the loser re-reads the winner's
    manifest and either *rebases* (its touched buckets are untouched
    by the winner — just re-point them and re-attempt the commit) or
    *retries the whole merge* (bucket overlap — its survivors were
    computed from a stale snapshot, so the written generation is
    discarded and recomputed). Exclusive create is atomic on POSIX
    and HDFS; on S3 use a conditional PUT (If-None-Match) the same
    way. The last ``_MANIFEST_RETAIN`` manifests are kept so
    concurrent readers never observe a missing file."""

    _MANIFEST_RETAIN = 10

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema_ddl: str,
        key_col: str,
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl
        self.key_col = key_col
        self.n_buckets = n_buckets

    # -- manifest (optimistic-concurrency commit log) ---------------------

    def _numbered_path(self, seq: int) -> str:
        return os.path.join(self.path, f"MANIFEST.{seq:012d}.json")

    def _manifest_seqs(self) -> list[int]:
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return []
        seqs = []
        for n in names:
            if n.startswith("MANIFEST.") and n.endswith(".json"):
                mid = n[len("MANIFEST."):-len(".json")]
                if mid.isdigit():
                    seqs.append(int(mid))
        return sorted(seqs)

    def _manifest(self) -> dict:
        import json

        seqs = self._manifest_seqs()
        if seqs:
            with open(self._numbered_path(seqs[-1])) as f:
                return json.load(f)
        # legacy single-pointer layout (pre-OCC states)
        try:
            with open(os.path.join(self.path, "MANIFEST.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"seq": -1, "buckets": {}}

    def _try_commit(self, manifest: dict) -> bool:
        """Claim ``MANIFEST.{seq}.json`` atomically; False = lost the
        race. The body is fully written to a temp file first and
        ``os.link``ed into place, so a claimed manifest is always
        complete (no create-then-write crash window)."""
        import json
        import uuid

        os.makedirs(self.path, exist_ok=True)
        target = self._numbered_path(manifest["seq"])
        tmp = os.path.join(self.path, f".commit-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, target)
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        for s in self._manifest_seqs()[: -self._MANIFEST_RETAIN]:
            try:
                os.unlink(self._numbered_path(s))
            except FileNotFoundError:
                pass
        return True

    # -- read -------------------------------------------------------------

    def _bucket_of(self, col) -> F.Column:
        return F.pmod(
            F.crc32(col.cast("string").cast("binary")), F.lit(self.n_buckets)
        )

    def _manifest_at(self, seq: int) -> dict:
        import json

        try:
            with open(self._numbered_path(seq)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot seq={seq} is not retained (last"
                f" {self._MANIFEST_RETAIN} kept: {self._manifest_seqs()})"
            ) from None

    def history(self) -> list[dict]:
        """Retained snapshots, oldest first (the time-travel surface:
        ``read(as_of_seq=h['seq'])`` reads any of them)."""
        return [self._manifest_at(s) for s in self._manifest_seqs()]

    def _bucket_paths(
        self, buckets: list[int] | None = None, as_of_seq: int | None = None
    ) -> list[str]:
        m = (
            self._manifest() if as_of_seq is None else self._manifest_at(as_of_seq)
        )["buckets"]
        items = m.items() if buckets is None else [
            (str(b), m[str(b)]) for b in buckets if str(b) in m
        ]
        return [
            os.path.join(self.path, gen, f"_bucket={b}") for b, gen in items
        ]

    def read(
        self, buckets: list[int] | None = None, as_of_seq: int | None = None
    ) -> DataFrame:
        paths = self._bucket_paths(buckets, as_of_seq)
        if not paths:
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.parquet(*paths)

    def read_keys(
        self, keys: DataFrame, buckets: list[int] | None = None
    ) -> DataFrame:
        """Current rows for the given keys: bucket-pruned read +
        semi-join (O(touched buckets), not O(state)).

        ``buckets``: the keys' pre-computed bucket ids (r10: callers
        that already collected the bucket set of a checkpointed delta
        — e.g. MaterializedJoin, whose side states share key + bucket
        count — pass it here to skip a redundant distinct+collect
        job)."""
        if not self._manifest()["buckets"]:
            # empty state: skip the bucket-collect job entirely (a
            # first IVM batch otherwise pays a full scan of `keys`
            # just to learn there is nothing to read)
            return self.spark.createDataFrame([], self.schema_ddl)
        if buckets is None:
            buckets = [
                r["b"]
                for r in keys.select(
                    self._bucket_of(F.col(self.key_col)).alias("b")
                ).distinct().collect()
            ]
        return self.read(buckets).join(
            keys.select(self.key_col).distinct(), self.key_col, "left_semi"
        )

    # -- write ------------------------------------------------------------

    def merge(
        self,
        upserts: DataFrame,
        delete_keys: DataFrame | None = None,
        max_retries: int = 10,
    ) -> list[int]:
        """Upsert rows (full replacement per key) + delete keys.
        Rewrites only the touched buckets; returns their ids.

        Safe under concurrent writers: survivors are computed from a
        snapshot, and the commit CAS detects whether any *touched*
        bucket moved since that snapshot — disjoint-bucket winners
        cause a cheap rebase, overlapping ones a full recompute."""
        import uuid

        key = self.key_col
        changed_keys = upserts.select(key)
        if delete_keys is not None:
            changed_keys = changed_keys.unionByName(delete_keys.select(key))
        touched = sorted(
            r["b"]
            for r in changed_keys.select(
                self._bucket_of(F.col(key)).alias("b")
            ).distinct().collect()
        )
        if not touched:
            return []

        def build_out():
            cur = self.read(touched)
            survivors = cur.join(changed_keys.distinct(), key, "left_anti")
            return survivors.unionByName(
                upserts.select(*cur.columns), allowMissingColumns=True
            )

        return self._occ_write(touched, build_out, max_retries, op="merge")

    def fold_merge(
        self,
        delta: DataFrame,
        fold,
        keep: F.Column,
        max_retries: int = 10,
        join_on: list[str] | None = None,
        touched: list[int] | None = None,
    ) -> list[int]:
        """MERGE with computed updates in ONE state pass per attempt.

        :meth:`merge` needs its caller to pre-join current state with
        the delta to compute the new rows, so an IVM refresh pays two
        bucket-pruned state reads per batch (the caller's join + the
        survivor rewrite). This variant moves the fold INTO the
        rewrite — the same idea as a RocksDB merge operator or Delta
        MERGE's matched clauses: per attempt the touched buckets are
        read ONCE, full_outer-joined with ``delta`` (aliases ``c`` =
        current row, ``d`` = delta row), ``fold(joined)`` projects the
        new full state rows (must include ``key_col``), and the
        ``keep`` Column decides which folded rows are written (keys
        folding to not-keep disappear by not being rewritten —
        deletes). Current rows whose key has no delta row flow
        through the fold with ``d``-side nulls, so the fold's
        arithmetic must be identity on them (coalesce-to-zero deltas
        do this naturally).

        ``delta`` must be small and pre-materialized
        (``localCheckpoint``): it is evaluated once for the touched-
        bucket set and once per attempt for the join. Measured on the
        streaming IVM bench: one state read+listing per batch instead
        of two (profile in SCALING.md `foreach_batch_ivm floor`).

        ``join_on`` (default ``[key_col]``): the full_outer join
        columns. States whose rows are NOT unique per ``key_col``
        (e.g. a join-side multiset bucketed by join key with one row
        per (key, payload)) pass the full uniqueness tuple here —
        bucket pruning still runs on ``key_col`` alone, so the state
        keeps its pruned-read property while the fold stays a
        one-pass merge (r10: MaterializedJoin's side states, which
        previously paid the read_keys + checkpoint + merge + gone
        five-action path per side per batch). The multi-column join
        is NULL-SAFE (``<=>``) so NULL payload values unify the way
        a groupBy would — which means the fold receives QUALIFIED
        ``c.``/``d.`` copies of the join columns and must coalesce
        them itself (unlike the default name join, whose output is
        USING-coalesced).

        ``touched``: the delta's pre-computed bucket ids (r10: skips
        this method's own distinct+collect job when the caller
        already knows them — must be exactly the bucket set of
        ``delta``'s keys, or buckets outside it keep stale rows)."""
        key = self.key_col
        if touched is None:
            touched = sorted(
                r["b"]
                for r in delta.select(
                    self._bucket_of(F.col(key)).alias("b")
                ).distinct().collect()
            )
        else:
            touched = sorted(touched)
        if not touched:
            return []

        def build_out():
            cur = self.read(touched)
            # full_outer cannot build a broadcast side — both inputs
            # here are small (touched buckets + checkpointed delta),
            # so the single shuffle is the honest plan
            if join_on is None:
                joined = cur.alias("c").join(delta.alias("d"), key,
                                             "full_outer")
            else:
                import functools

                cond = functools.reduce(
                    lambda a, b: a & b,
                    [
                        F.col(f"c.{n}").eqNullSafe(F.col(f"d.{n}"))
                        for n in join_on
                    ],
                )
                joined = cur.alias("c").join(
                    delta.alias("d"), cond, "full_outer"
                )
            return fold(joined).filter(keep)

        return self._occ_write(touched, build_out, max_retries,
                               op="fold_merge")

    def fold_merge_sum(
        self,
        delta: DataFrame,
        on: list[str],
        sum_cols: tuple[str, ...] = ("m",),
        keep_col: str | None = None,
        max_retries: int = 10,
        touched: list[int] | None = None,
    ) -> list[int]:
        """:meth:`fold_merge` specialized to the signed sum fold (the
        MaterializedJoin/Distinct/Quantile/sum-Agg state shape): rows
        are unique per the ``on`` tuple, every other column is summed
        (``sum_cols``, integral columns kept bigint, doubles kept
        double); rows whose ``keep_col`` (default ``sum_cols[0]``)
        folds to <= 0 disappear. A plain ``union + groupBy`` computes
        that fold with ONE exchange where the generic path's
        full_outer join needs two-sided shuffles — and groupBy's
        NULL-grouping already matches the null-safe join semantics.
        The two-term add per group is order-independent for doubles
        too (IEEE addition is commutative), so results are identical
        to the coalesce-and-add fold. ``on`` + ``sum_cols`` must
        cover every state column; ``touched`` as in fold_merge."""
        key = self.key_col
        if touched is None:
            touched = sorted(
                r["b"]
                for r in delta.select(
                    self._bucket_of(F.col(key)).alias("b")
                ).distinct().collect()
            )
        else:
            touched = sorted(touched)
        if not touched:
            return []
        empty = self.spark.createDataFrame([], self.schema_ddl)
        cols = [c for c in empty.columns if c not in sum_cols]
        if set(on) != set(cols):
            raise ValueError(
                f"fold_merge_sum: `on` + sum_cols must cover every"
                f" state column (non-summed: {cols})"
            )
        types = dict(empty.dtypes)
        keep_col = keep_col or sum_cols[0]

        def build_out():
            cur = self.read(touched).select(*cols, *sum_cols)
            return (
                cur.unionByName(delta.select(*cols, *sum_cols))
                .groupBy(*on)
                .agg(*[
                    F.sum(c).cast(types[c]).alias(c) for c in sum_cols
                ])
                .filter(F.col(keep_col) > 0)
                .select(*cols, *sum_cols)
            )

        return self._occ_write(touched, build_out, max_retries,
                               op="fold_merge_sum")

    def _occ_write(
        self, touched: list[int], build_out, max_retries: int, op: str
    ) -> list[int]:
        """Shared OCC write/commit loop: write ``build_out()`` (full
        replacement rows for the touched buckets) into a fresh
        generation, then CAS the manifest — rebase on disjoint-bucket
        winners, recompute on overlap."""
        import uuid

        for _attempt in range(max_retries):
            snapshot = self._manifest()
            out = build_out().withColumn(
                "_bucket", self._bucket_of(F.col(self.key_col))
            )

            gen = f"gen_{snapshot['seq'] + 1}_{uuid.uuid4().hex[:8]}"
            gen_dir = os.path.join(self.path, gen)
            (
                # task width pinned to the TOUCHED bucket count, not
                # spark.sql.shuffle.partitions: each task owns ~one
                # bucket and writes one file into its partition dir —
                # a 32-task repartition for an 8-bucket state is 3/4
                # empty tasks per generation write, pure scheduling
                # overhead on the small-batch IVM path (r10 profile),
                # while at scale bucket count IS the natural write
                # parallelism
                out.repartition(max(len(touched), 1), "_bucket")
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(gen_dir)
            )
            # buckets that ended up empty (every key deleted) write no dir
            written = {
                int(d.split("=")[1])
                for d in os.listdir(gen_dir)
                if d.startswith("_bucket=")
            }

            base = snapshot
            while True:
                manifest = {"seq": base["seq"] + 1,
                            "buckets": dict(base["buckets"])}
                for b in touched:
                    if b in written:
                        manifest["buckets"][str(b)] = gen
                    else:
                        manifest["buckets"].pop(str(b), None)
                if self._try_commit(manifest):
                    self._gc_unreferenced()
                    return touched
                latest = self._manifest()
                if any(
                    latest["buckets"].get(str(b)) != snapshot["buckets"].get(str(b))
                    for b in touched
                ):
                    # a winner rewrote one of OUR buckets: survivors are
                    # stale — discard this generation, recompute
                    shutil.rmtree(gen_dir, ignore_errors=True)
                    break
                # winner touched only other buckets: rebase and re-CAS
                base = latest
        raise RuntimeError(
            f"BucketedParquetState.{op}: lost the commit race {max_retries}"
            f" times on overlapping buckets {touched} — giving up"
        )

    def overwrite(self, df: DataFrame, max_retries: int = 10) -> None:
        """Full rewrite (initial load / compaction). Overwrite always
        wins semantically, so a lost CAS just re-claims the next seq
        without rewriting data."""
        import uuid

        snapshot = self._manifest()
        gen = f"gen_{snapshot['seq'] + 1}_{uuid.uuid4().hex[:8]}"
        gen_dir = os.path.join(self.path, gen)
        (
            df.withColumn("_bucket", self._bucket_of(F.col(self.key_col)))
            .repartition("_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(gen_dir)
        )
        written = {
            int(d.split("=")[1])
            for d in os.listdir(gen_dir)
            if d.startswith("_bucket=")
        }
        for _attempt in range(max_retries):
            base = self._manifest()
            manifest = {
                "seq": base["seq"] + 1,
                "buckets": {str(b): gen for b in sorted(written)},
            }
            if self._try_commit(manifest):
                self._gc_unreferenced()
                return
        raise RuntimeError(
            f"BucketedParquetState.overwrite: lost the commit race"
            f" {max_retries} times — giving up"
        )

    def vacuum(self, include_recent: bool = False) -> list[str]:
        """Explicit vacuum for operational hygiene. The conservative
        form equals the automatic post-commit GC; ``include_recent``
        ALSO removes unreferenced generations in the recent-seq
        window — the garbage a crashed writer leaves (data written,
        commit never claimed). Only call that form when no writers
        are active: an in-flight writer's uncommitted generation is
        indistinguishable from crash garbage."""
        return self._gc_unreferenced(include_recent=include_recent)

    def _gc_unreferenced(self, include_recent: bool = False) -> list[str]:
        """Retention-aware vacuum (run after every commit): delete
        bucket dirs referenced by NO retained manifest, but (unless
        ``include_recent``) never touch generations whose seq is
        within the retained window — those may belong to retained
        snapshots (time travel) or to in-flight writers racing on
        recent seqs. Bounded garbage: a replaced bucket survives at
        most ``_MANIFEST_RETAIN`` commits."""
        removed: list[str] = []
        seqs = self._manifest_seqs()
        if not seqs:
            return removed
        min_seq = seqs[0]
        referenced: set[tuple[str, int]] = set()
        for s in seqs:
            try:
                m = self._manifest_at(s)
            except ValueError:
                continue
            for b, gen in m["buckets"].items():
                referenced.add((gen, int(b)))
        for d in os.listdir(self.path):
            if not d.startswith("gen_"):
                continue
            try:
                gseq = int(d.split("_")[1])
            except (IndexError, ValueError):
                gseq = None
            if not include_recent and gseq is not None and gseq >= min_seq:
                continue
            gdir = os.path.join(self.path, d)
            for bd in os.listdir(gdir):
                if bd.startswith("_bucket=") and (
                    d, int(bd.split("=")[1])
                ) not in referenced:
                    target = os.path.join(gdir, bd)
                    shutil.rmtree(target, ignore_errors=True)
                    removed.append(target)
            if not os.listdir(gdir):
                os.rmdir(gdir)
        return removed


class IncrementalRunner:
    """Drives one source → transform → target pipeline incrementally."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        logic_fingerprint: str,
        key_col: str = "key",
        ordinal_col: str = "ordinal",
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.logic_fp = logic_fingerprint
        self.key_col = key_col
        self.ordinal_col = ordinal_col
        os.makedirs(state_dir, exist_ok=True)
        # bucketed: an update rewrites only buckets containing changed
        # keys — O(Δ) tracking I/O per run instead of O(all tracked keys)
        self.tracking = BucketedParquetState(
            spark,
            os.path.join(state_dir, "tracking"),
            "_key string, _ordinal long, _content_hash string, "
            "_logic_fp string, _process_ordinal long",
            key_col="_key",
        )

    # -- skip/process/delete decision (one full-outer join) ---------------

    def plan(self, listing: DataFrame, content_cols: list[str]) -> DataFrame:
        """Annotate the listing with the action per key.

        ``listing``: current source rows with key + ordinal + content
        columns. Returns listing columns + ``_action`` in
        {process, bump, skip, delete} (delete rows carry only _key).
        """
        src = listing.withColumn(
            "_key", F.col(self.key_col).cast("string")
        ).withColumn("_src_hash", content_hash(*content_cols))
        trk = self.tracking.read()

        j = src.alias("s").join(trk.alias("t"), "_key", "full_outer")
        ordc = F.col(f"s.{self.ordinal_col}")
        action = (
            F.when(F.col("s._src_hash").isNull(), F.lit("delete"))
            .when(F.col("t._ordinal").isNull(), F.lit("process"))
            .when(
                ordc > F.col("t._ordinal"),
                F.when(
                    (F.col("s._src_hash") == F.col("t._content_hash"))
                    & (F.col("t._logic_fp") == F.lit(self.logic_fp)),
                    F.lit("bump"),
                ).otherwise(F.lit("process")),
            )
            .when(
                ordc == F.col("t._ordinal"),
                F.when(
                    F.col("t._logic_fp") == F.lit(self.logic_fp), F.lit("skip")
                ).otherwise(F.lit("process")),
            )
            .otherwise(F.lit("skip"))  # stale ordinal: last-writer-wins
        )
        src_cols = [c for c in src.columns if c != "_key"]
        return j.select(
            *[F.col(f"s.{c}").alias(c) for c in src_cols],
            F.col("_key"),
            action.alias("_action"),
        )

    # -- one incremental update run ---------------------------------------

    def update(
        self,
        listing: DataFrame,
        content_cols: list[str],
        transform: Callable[[DataFrame], DataFrame],
        target: ParquetState,
        target_key: str = "_key",
    ) -> dict[str, int]:
        """Process changed rows, bump unchanged, delete gone keys.

        The expensive ``transform`` runs ONLY over action=process
        rows. Returns counters (like the reference's stats report,
        live_updater.rs REPORT_INTERVAL)."""
        planned = self.plan(listing, content_cols)
        planned = planned.persist()
        try:
            counts = {
                r["_action"]: r["count"]
                for r in planned.groupBy("_action").count().collect()
            }
            to_process = planned.filter("_action = 'process'").drop("_action")
            to_bump = planned.filter("_action = 'bump'").drop("_action")
            deletes = planned.filter("_action = 'delete'").select("_key")

            # 1. run the transform over changed rows only; checkpoint so
            # the (possibly expensive) transform executes exactly once —
            # the bucketed merge evaluates its input twice (bucket
            # discovery + write)
            new_rows = transform(
                to_process.drop("_key", "_src_hash")
            ).localCheckpoint(eager=True)

            # 2. target MERGE: delete gone keys + upsert new results.
            # Bucketed targets rewrite only the touched buckets; the
            # plain ParquetState path is kept for tiny states.
            if isinstance(target, BucketedParquetState):
                target.merge(
                    new_rows,
                    delete_keys=deletes.select(
                        F.col("_key").alias(target.key_col)
                    ),
                )
            else:
                cur = target.read()
                changed_keys = planned.filter(
                    "_action in ('process','delete')"
                ).select(F.col("_key").alias("_changed_key"))
                survivors = cur.join(
                    changed_keys,
                    cur[target_key] == F.col("_changed_key"),
                    "left_anti",
                )
                target.overwrite(
                    survivors.unionByName(new_rows, allowMissingColumns=True)
                )

            # 3. tracking MERGE (the reference's 2-phase commit collapses
            #    to one atomic state swap here)
            proc_ord = F.lit(self._next_process_ordinal())
            new_trk = (
                to_process.select(
                    "_key",
                    F.col(self.ordinal_col).alias("_ordinal"),
                    F.col("_src_hash").alias("_content_hash"),
                )
                .withColumn("_logic_fp", F.lit(self.logic_fp))
                .withColumn("_process_ordinal", proc_ord)
            )
            bump_trk = to_bump.select(
                "_key",
                F.col(self.ordinal_col).alias("_ordinal"),
                F.col("_src_hash").alias("_content_hash"),
            ).withColumn("_logic_fp", F.lit(self.logic_fp)).withColumn(
                "_process_ordinal", proc_ord
            )
            # bucketed MERGE: only buckets with processed/bumped/deleted
            # keys are rewritten (the reference's 2-phase commit collapses
            # to the manifest swap inside merge())
            self.tracking.merge(
                new_trk.unionByName(bump_trk), delete_keys=deletes
            )
            return {
                "processed": counts.get("process", 0),
                "bumped": counts.get("bump", 0),
                "skipped": counts.get("skip", 0),
                "deleted": counts.get("delete", 0),
            }
        finally:
            planned.unpersist()

    def _next_process_ordinal(self) -> int:
        trk = self.tracking.read()
        row = trk.agg(F.max("_process_ordinal").alias("m")).collect()[0]
        return (row["m"] or 0) + 1


class MemoCache:
    """Function-result memoization (memoization.rs:17-233).

    Wraps an expensive DataFrame-transform (LLM/embedding UDF): cache
    hit rows skip the UDF entirely; misses run it and are written
    back. Keyed by (behavior_version, args-hash) like the reference's
    per-function cache with behavior_version invalidation
    (interface.rs:178-186)."""

    def __init__(
        self, spark: SparkSession, path: str, value_schema_ddl: str,
        behavior_version: int = 1,
    ):
        self.state = BucketedParquetState(
            spark, path, f"_memo_key string, {value_schema_ddl}",
            key_col="_memo_key",
        )
        self.behavior_version = behavior_version

    def memo_key(self, *arg_cols) -> F.Column:
        return F.sha2(
            F.concat_ws(
                "\x00",
                F.lit(str(self.behavior_version)),
                *[F.col(c).cast("string") for c in arg_cols],
            ),
            256,
        )

    def through(
        self,
        df: DataFrame,
        arg_cols: list[str],
        fn: Callable[[DataFrame], DataFrame],
        value_cols: list[str],
    ) -> DataFrame:
        """df + memo → (hits ∪ fn(misses)); cache updated with misses."""
        keyed = df.withColumn("_memo_key", self.memo_key(*arg_cols))
        # bucket-pruned cache lookup: reads only the buckets the input
        # keys hash into, not the whole cache
        cache = self.state.read_keys(keyed.select("_memo_key"))
        hits = keyed.join(cache, "_memo_key")
        misses = keyed.join(cache.select("_memo_key"), "_memo_key", "left_anti")
        # materialize the miss computation ONCE: both the returned rows
        # and the cache write are built from this checkpoint, so the
        # expensive fn never runs twice and a nondeterministic fn can't
        # cache a different value than it returned
        computed = fn(misses).localCheckpoint(eager=True)
        # materialize BEFORE the merge: the hits plan references the
        # current bucket files, which merge() replaces and GCs
        result = hits.unionByName(computed.select(*hits.columns)).localCheckpoint(
            eager=True
        )
        self.state.merge(
            computed.select("_memo_key", *value_cols).dropDuplicates(
                ["_memo_key"]
            )
        )
        return result.drop("_memo_key")
