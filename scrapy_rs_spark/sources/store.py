"""Durable crawl state: per-round committed tables + resume.

Production design is Iceberg (ACID commits, bucket(url_hash) partition
transform, storage-partitioned joins so the 10^10-row seen set is never
re-shuffled). This sandbox has no Iceberg runtime jar, so the store is
parquet directories with the same layout discipline:

    root/rounds/round=NNNNNN/frontier/        (parquet)
    root/rounds/round=NNNNNN/seen_delta/      (parquet, partitioned by bucket)
    root/rounds/round=NNNNNN/items/           (parquet)
    root/rounds/round=NNNNNN/host_served/     (parquet)
    root/rounds/round=NNNNNN/metrics.json     (counters)
    root/rounds/round=NNNNNN/lineage.json     (per-partition lineage)
    root/rounds/round=NNNNNN/MANIFEST.json    (commit marker, written last)

A round is committed iff MANIFEST.json exists — the parquet analogue of
an Iceberg snapshot commit; resume reads the max committed round
(reference analogue: EngineState save/load,
/root/reference/engine/src/lib.rs:1196-1252).

Seen-set = union of seen_delta across committed rounds, hash-bucketed by
``pmod(url_hash, seen_buckets)`` so membership probes prune buckets and
the anti-join co-partitions. Deltas keep commits O(new urls), not
O(total seen); `compact_seen` folds deltas when they pile up.

Reading state back each round also truncates DataFrame lineage — the
iterative-loop plan would otherwise grow unboundedly.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scrapy_rs_spark.schemas import FRONTIER_DDL

MANIFEST = "MANIFEST.json"


class CrawlStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        seen_buckets: int = 32,
        bucketed_seen: bool = False,
    ):
        """bucketed_seen=True stores the seen set as a Spark BUCKETED
        TABLE (bucketBy(url_hash) + sortBy, external location under the
        store root) instead of per-round parquet delta dirs. The
        bucketed scan's output partitioning satisfies the anti-join's
        clustering requirement, so the seen side joins with NO Exchange
        — the sandbox demonstration of the design's Iceberg
        storage-partitioned join (SURVEY §4.2): the 10^10-row seen set
        is never re-shuffled; only the (small) per-round candidate batch
        is. Commit discipline is preserved: delta rows carry their round
        number and readers filter to committed rounds, so an interrupted
        append is invisible (a crash-then-rerun can leave duplicate
        url_hash rows for one round — harmless to anti-join membership,
        same guarantee compact_seen documents)."""
        self.spark = spark
        self.root = root
        self.seen_buckets = seen_buckets
        self.bucketed_seen = bucketed_seen
        os.makedirs(self._rounds_dir(), exist_ok=True)
        if bucketed_seen:
            self._ensure_seen_table()

    # ---- bucketed seen table ----
    @property
    def _seen_table(self) -> str:
        import hashlib

        tag = hashlib.md5(
            os.path.abspath(self.root).encode()
        ).hexdigest()[:12]
        return f"crawl_seen_{tag}"

    def _seen_table_path(self) -> str:
        return os.path.join(self.root, "seen_bucketed")

    def _seen_meta_path(self) -> str:
        return os.path.join(self.root, "seen_bucketed_meta.json")

    def _recover_seen_table_dir(self) -> None:
        """Crash recovery for _compact_seen_bucketed's rename window: the
        compacted table is fully written to ``seen_bucketed_compact``
        BEFORE the two renames (main → ``_old``, ``_compact`` → main), so
        a crash between them leaves main missing with the complete data
        in one (or both) side dirs. Without this, a restart would
        register NO seen table and silently treat the whole crawl
        history as unseen. Prefer the compacted dir (the newer state);
        fall back to the pre-compaction backup."""
        path = self._seen_table_path()
        if os.path.isdir(path):
            return
        tmp = path + "_compact"
        bak = path + "_old"
        for cand in (tmp, bak):
            if os.path.isdir(cand):
                os.replace(cand, path)
                break
        else:
            return
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(bak, ignore_errors=True)

    def _check_seen_meta(self) -> None:
        """Pin the bucket count at table creation. Bucketing is declared
        per-session from CURRENT settings (``CLUSTERED BY ... INTO N
        BUCKETS`` over existing files); resuming with a different
        ``seen_buckets`` would silently declare WRONG bucketing over the
        on-disk layout and the exchange-free anti-join could mis-cluster
        — letting already-seen URLs through. Fail loud instead."""
        meta = self._seen_meta_path()
        if os.path.exists(meta):
            with open(meta) as f:
                stored = json.load(f).get("seen_buckets")
            if stored != self.seen_buckets:
                raise ValueError(
                    f"seen_bucketed table at {self._seen_table_path()} was"
                    f" created with seen_buckets={stored}; this store was"
                    f" opened with seen_buckets={self.seen_buckets}."
                    " Reopen with the original bucket count (or compact"
                    " with the original count first)."
                )
        else:
            tmp = meta + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"seen_buckets": self.seen_buckets}, f)
            os.replace(tmp, meta)

    def _ensure_seen_table(self) -> None:
        """Register the bucketed seen table in the session catalog.
        Bucketing metadata lives in the CATALOG, not the files — a new
        session (resume) must re-register the existing location or the
        scan degrades to a plain parquet read (and the anti-join would
        re-shuffle the seen side)."""
        self._recover_seen_table_dir()
        self._check_seen_meta()
        if self.spark.catalog.tableExists(self._seen_table):
            return
        path = self._seen_table_path()
        if os.path.isdir(path):
            # resume in a fresh session: re-attach the existing data
            self.spark.sql(
                f"CREATE TABLE {self._seen_table}"
                " (url_hash BIGINT, bucket INT, round INT)"
                " USING parquet"
                " CLUSTERED BY (url_hash) SORTED BY (url_hash)"
                f" INTO {self.seen_buckets} BUCKETS"
                f" LOCATION '{path}'"
            )

    def _append_seen_bucketed(self, seen_delta: DataFrame, rnd: int) -> None:
        (
            seen_delta.select(
                F.col("url_hash").cast("bigint").alias("url_hash"),
                F.pmod(F.col("url_hash"), F.lit(self.seen_buckets))
                .cast("int")
                .alias("bucket"),
                F.lit(rnd).cast("int").alias("round"),
            )
            .write.format("parquet")
            .bucketBy(self.seen_buckets, "url_hash")
            .sortBy("url_hash")
            .option("path", self._seen_table_path())
            .mode("append")
            .saveAsTable(self._seen_table)
        )

    # ---- layout ----
    def _rounds_dir(self) -> str:
        return os.path.join(self.root, "rounds")

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self._rounds_dir(), f"round={rnd:06d}")

    def committed_rounds(self) -> list[int]:
        out = []
        if not os.path.isdir(self._rounds_dir()):
            return out
        for name in os.listdir(self._rounds_dir()):
            if name.startswith("round="):
                rnd = int(name.split("=")[1])
                if os.path.exists(os.path.join(self._round_dir(rnd), MANIFEST)):
                    out.append(rnd)
        return sorted(out)

    def latest_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    # ---- commit ----
    def begin_round(self, rnd: int) -> None:
        """Clear any uncommitted leftovers for a round so partial writes
        (write_items before commit_round) start from a clean dir. The
        (empty) dir is created so a round whose parquet all lands
        elsewhere (bucketed seen table) can still seal metrics/MANIFEST
        into it."""
        d = self._round_dir(rnd)
        if os.path.exists(d):
            shutil.rmtree(d)  # re-running an uncommitted round is safe
        os.makedirs(d, exist_ok=True)

    def write_items(self, rnd: int, items: DataFrame | None) -> None:
        """Write a round's items ahead of commit_round (still invisible
        to readers until MANIFEST exists). Lets the engine resolve
        observations attached to the items plan before sealing metrics."""
        if items is not None:
            items.write.mode("overwrite").parquet(
                os.path.join(self._round_dir(rnd), "items")
            )

    def write_frontier(self, rnd: int, frontier: DataFrame) -> None:
        """Stage a round's frontier ahead of commit_round (invisible to
        readers until MANIFEST exists). Lets the engine resolve an
        Observation attached to the frontier plan — committed frontier
        size + new-URL count ride the write action — before sealing
        metrics; pass frontier=None to commit_round afterwards."""
        frontier.write.mode("overwrite").parquet(
            os.path.join(self._round_dir(rnd), "frontier")
        )

    def write_seen_delta(self, rnd: int, seen_delta: DataFrame) -> None:
        """Stage a round's seen delta ahead of commit_round (invisible
        to readers until MANIFEST: the plain layout lives inside the
        round dir, the bucketed table tags rows with the round and
        readers filter to committed rounds). Lets the engine overlap
        the items / frontier / seen writes; pass seen_delta=None to
        commit_round afterwards."""
        if self.bucketed_seen:
            # append into the bucketed table, tagged with the round;
            # readers filter to committed rounds so this stays invisible
            # until MANIFEST lands
            self._append_seen_bucketed(seen_delta, rnd)
            return
        (
            seen_delta.withColumn(
                "bucket",
                F.pmod(
                    F.col("url_hash"), F.lit(self.seen_buckets)
                ).cast("int"),
            )
            # cluster rows by bucket before the partitioned write: one
            # file per bucket instead of (tasks × buckets) small files
            .repartition(self.seen_buckets, F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(self._round_dir(rnd), "seen_delta"))
        )

    def commit_round(
        self,
        rnd: int,
        frontier: DataFrame | None,
        seen_delta: DataFrame | None,
        items: DataFrame | None,
        host_served: DataFrame | None,
        metrics: dict,
        clean: bool = True,
    ) -> None:
        """Write all state for a round, MANIFEST last (commit point).

        An interrupted write leaves no MANIFEST → the round is invisible
        to resume, exactly like an uncommitted Iceberg snapshot.
        clean=False preserves state already staged into the round dir
        (begin_round + write_items/write_frontier/write_seen_delta;
        frontier=None / items=None / seen_delta=None mean "already
        staged")."""
        d = self._round_dir(rnd)
        if clean:
            self.begin_round(rnd)
        if frontier is not None:
            frontier.write.mode("overwrite").parquet(
                os.path.join(d, "frontier")
            )
        if seen_delta is not None:
            self.write_seen_delta(rnd, seen_delta)
        if items is not None:
            items.write.mode("overwrite").parquet(os.path.join(d, "items"))
        if host_served is not None:
            host_served.write.mode("overwrite").parquet(
                os.path.join(d, "host_served")
            )
        with open(os.path.join(d, "metrics.json"), "w") as f:
            json.dump(metrics, f)
        with open(os.path.join(d, "lineage.json"), "w") as f:
            json.dump(self._harvest_lineage(rnd), f)
        with open(os.path.join(d, MANIFEST), "w") as f:
            json.dump({"round": rnd, "metrics": metrics}, f)

    # ---- read back ----
    def load_frontier(self, rnd: int) -> DataFrame:
        return self.spark.read.schema(FRONTIER_DDL).parquet(
            os.path.join(self._round_dir(rnd), "frontier")
        )

    def load_seen(self, upto_round: int | None = None) -> DataFrame:
        """Union of committed seen deltas ≤ upto_round."""
        if self.bucketed_seen:
            # one bucketed-table scan, filtered to committed rounds
            # (uncommitted appends are always > the latest committed
            # round — rounds commit in order). The filter is a cheap
            # data filter; the scan keeps its bucketed output
            # partitioning, so downstream anti-joins need no Exchange
            # on this side.
            self._ensure_seen_table()
            if not self.spark.catalog.tableExists(self._seen_table):
                return self.spark.createDataFrame(
                    [], "url_hash BIGINT, bucket INT"
                )
            latest = self.latest_round()
            if latest is None:
                return self.spark.createDataFrame(
                    [], "url_hash BIGINT, bucket INT"
                )
            cutoff = latest if upto_round is None else min(latest, upto_round)
            return (
                self.spark.table(self._seen_table)
                .filter(F.col("round") <= F.lit(cutoff))
                .select("url_hash", "bucket")
            )
        rounds = self.committed_rounds()
        if upto_round is not None:
            rounds = [r for r in rounds if r <= upto_round]
        paths = [
            os.path.join(self._round_dir(r), "seen_delta") for r in rounds
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return self.spark.createDataFrame(
                [], "url_hash BIGINT, bucket INT"
            )
        # one read per delta (each has its own bucket= partition root);
        # a multi-path read would trip partition-discovery conflicts
        out = None
        for p in paths:
            df = (
                self.spark.read.schema("url_hash BIGINT, bucket INT")
                .parquet(p)
                .select("url_hash", "bucket")
            )
            out = df if out is None else out.unionByName(df)
        return out

    def seen_delta_rounds(self) -> set[int]:
        """Committed rounds whose seen_delta directory still exists
        (compaction prunes earlier ones). The store owns the layout —
        callers maintaining incremental seen caches key off this."""
        return {
            r
            for r in self.committed_rounds()
            if os.path.isdir(os.path.join(self._round_dir(r), "seen_delta"))
        }

    def load_seen_delta(self, rnd: int) -> DataFrame | None:
        """One committed round's seen delta (None if compacted away) —
        lets callers maintain an incrementally-extended seen DataFrame
        instead of re-listing every delta directory each round."""
        p = os.path.join(self._round_dir(rnd), "seen_delta")
        if not os.path.isdir(p):
            return None
        return (
            self.spark.read.schema("url_hash BIGINT, bucket INT")
            .parquet(p)
            .select("url_hash", "bucket")
        )

    def seen_generation(self) -> int:
        """Monotone counter bumped by every compact_seen. A compaction
        rewrites the NEWEST round's seen_delta dir IN PLACE, which a
        caller's round-set cache key cannot see (the set of delta dirs is
        unchanged) — cached DataFrames would point at deleted parquet
        files. Cache the generation alongside the round set and rebuild
        when it moves."""
        p = os.path.join(self.root, "seen_generation")
        try:
            with open(p) as f:
                return int(f.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            return 0

    def _bump_seen_generation(self) -> None:
        p = os.path.join(self.root, "seen_generation")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(self.seen_generation() + 1))
        os.replace(tmp, p)

    def compact_seen(self) -> None:
        """Fold all committed seen deltas into the latest round's delta
        (Iceberg analogue: rewrite_data_files / snapshot expiry).

        Keeps load_seen O(1 read) instead of O(rounds). Crash-safe by
        ordering: the full union is written to a side dir first, swapped
        into the latest round, THEN earlier deltas are removed — a crash
        between swap and removal only leaves duplicate url_hash rows,
        which are harmless to anti-join membership. Bumps
        seen_generation() last so incremental-cache holders notice the
        in-place rewrite of the newest delta dir."""
        if self.bucketed_seen:
            self._compact_seen_bucketed()
            return
        rounds = self.committed_rounds()
        if len(rounds) < 2:
            return
        last = rounds[-1]
        union = self.load_seen().dropDuplicates(["url_hash"])
        last_dir = self._round_dir(last)
        tmp = os.path.join(last_dir, "seen_delta_compact")
        union.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        old = os.path.join(last_dir, "seen_delta")
        bak = os.path.join(last_dir, "seen_delta_old")
        if os.path.isdir(old):
            os.replace(old, bak)
        os.replace(tmp, old)
        shutil.rmtree(bak, ignore_errors=True)
        for r in rounds[:-1]:
            shutil.rmtree(
                os.path.join(self._round_dir(r), "seen_delta"),
                ignore_errors=True,
            )
        self._bump_seen_generation()

    def _compact_seen_bucketed(self) -> None:
        """Rewrite the bucketed seen table to ONE file per bucket
        (Iceberg analogue: rewrite_data_files). Appends land 1 file per
        bucket per round, so a long crawl accumulates buckets×rounds
        files — a 10^5-round standing crawl would hold millions — and a
        bucket spread over many files forfeits the SORTED BY metadata
        (Spark only reports sorted scan output for single-file buckets),
        so every anti-join re-sorts the seen side. Compaction restores
        both bounds: file count = buckets, and the SMJ's seen-side Sort
        is elided.

        Crash-safety mirrors compact_seen's plain path: the folded table
        is fully written to a side location first, then swapped in with
        two renames; a crash between them leaves either the old data or
        a recoverable ``seen_bucketed_old`` (plus at worst duplicate
        url_hash rows, harmless to anti-join membership). The catalog
        entries are session-scoped metadata and are re-registered from
        the on-disk location afterwards."""
        latest = self.latest_round()
        if latest is None:
            return
        main = self._seen_table_path()
        if not os.path.isdir(main):
            return
        tmp = main + "_compact"
        bak = main + "_old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(bak, ignore_errors=True)
        tmp_table = self._seen_table + "_compact"
        folded = (
            self.load_seen()  # committed rounds only
            .dropDuplicates(["url_hash"])
            .withColumn("round", F.lit(latest).cast("int"))
            .select("url_hash", "bucket", "round")
            # one output file per bucket: coalesce writer tasks to the
            # bucket count so each bucket's rows land in a single task
            .repartition(self.seen_buckets, F.col("url_hash"))
        )
        (
            folded.write.format("parquet")
            .bucketBy(self.seen_buckets, "url_hash")
            .sortBy("url_hash")
            .option("path", tmp)
            .mode("overwrite")
            .saveAsTable(tmp_table)
        )
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
        self.spark.sql(f"DROP TABLE IF EXISTS {self._seen_table}")
        os.replace(main, bak)
        os.replace(tmp, main)
        shutil.rmtree(bak, ignore_errors=True)
        self._ensure_seen_table()
        self.spark.catalog.refreshTable(self._seen_table)
        self._bump_seen_generation()

    def load_host_served(self, rnd: int) -> DataFrame:
        p = os.path.join(self._round_dir(rnd), "host_served")
        if not os.path.isdir(p):
            return self.spark.createDataFrame([], "host STRING, served BIGINT")
        return self.spark.read.schema("host STRING, served BIGINT").parquet(p)

    def load_items(self, rounds: list[int] | None = None) -> DataFrame:
        rounds = rounds if rounds is not None else self.committed_rounds()
        paths = [
            os.path.join(self._round_dir(r), "items")
            for r in rounds
            if os.path.isdir(os.path.join(self._round_dir(r), "items"))
        ]
        from scrapy_rs_spark.schemas import ITEMS_DDL

        if not paths:
            return self.spark.createDataFrame([], ITEMS_DDL)
        return self.spark.read.schema(ITEMS_DDL).parquet(*paths)

    def metrics_df(self) -> DataFrame:
        """crawl_metrics as a DataFrame (A1/A4): per-round counters for
        rate queries — (count - lag(count))/Δround etc."""
        rows = self.load_metrics()
        if not rows:
            return self.spark.createDataFrame(
                [], "round INT, requests BIGINT, responses BIGINT,"
                " items BIGINT, errors BIGINT, retries BIGINT,"
                " new_urls BIGINT, frontier_size BIGINT, seen_size BIGINT"
            )
        cols = ["round", "requests", "responses", "items", "errors",
                "retries", "new_urls", "frontier_size", "seen_size"]
        return self.spark.createDataFrame(
            [tuple(m.get(c, 0) for c in cols) for m in rows],
            "round INT, requests BIGINT, responses BIGINT, items BIGINT,"
            " errors BIGINT, retries BIGINT, new_urls BIGINT,"
            " frontier_size BIGINT, seen_size BIGINT",
        )

    def load_metrics(self) -> list[dict]:
        out = []
        for r in self.committed_rounds():
            with open(os.path.join(self._round_dir(r), "metrics.json")) as f:
                out.append(json.load(f))
        return out

    # ---- per-partition lineage (north rule: "per-partition lineage +
    # counters for resumable crawls") ----
    def _harvest_lineage(self, rnd: int) -> list[dict]:
        """One lineage row per data FILE the round committed:
        (dataset, partition, file, rows, bytes). Rows come from parquet
        footers, read driver-side — NO Spark jobs. This is the sandbox
        stand-in for the Iceberg manifest metadata the production design
        gets for free on every snapshot commit (Iceberg manifests record
        exactly this: file path, partition tuple, record count, size).
        The walk is O(files-per-round), which the writers bound:
        seen_delta is repartitioned to seen_buckets files, frontier to
        the shuffle-partition count — ~100 footer reads per round, never
        O(data)."""
        import pyarrow.parquet as pq

        d = self._round_dir(rnd)
        out = []
        for dataset in ("frontier", "seen_delta", "items", "host_served"):
            base = os.path.join(d, dataset)
            if not os.path.isdir(base):
                continue
            for dirpath, _dirs, files in os.walk(base):
                part = os.path.relpath(dirpath, base)
                part = "" if part == "." else part
                for fn in sorted(files):
                    if not fn.endswith(".parquet"):
                        continue
                    fp = os.path.join(dirpath, fn)
                    out.append(
                        {
                            "round": rnd,
                            "dataset": dataset,
                            "partition": part,
                            "file": fn,
                            "rows": pq.ParquetFile(fp).metadata.num_rows,
                            "bytes": os.path.getsize(fp),
                        }
                    )
        if self.bucketed_seen:
            out.extend(self._bucketed_delta_lineage(rnd))
        return out

    def _bucketed_delta_lineage(self, rnd: int) -> list[dict]:
        """Lineage for a bucketed-seen append: the round's delta rows
        live inside the shared bucketed table, so the round's files are
        identified by their footer statistics (every row group has
        round min == max == rnd — each append writes only its own round
        tag). The bucket id is the Spark bucketed-file suffix
        (part-XXXXX-<uuid>_NNNNN.*). Records taken at commit time stay
        valid as historical commit records even after compact_seen
        rewrites the table."""
        import re

        import pyarrow.parquet as pq

        loc = self._seen_table_path()
        if not os.path.isdir(loc):
            return []
        out = []
        for dirpath, _dirs, files in os.walk(loc):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(dirpath, fn)
                md = pq.ParquetFile(fp).metadata
                names = md.schema.to_arrow_schema().names
                if "round" not in names:
                    continue
                ci = names.index("round")
                stats = [
                    md.row_group(g).column(ci).statistics
                    for g in range(md.num_row_groups)
                ]
                if not stats or any(
                    s is None or s.min != rnd or s.max != rnd for s in stats
                ):
                    continue
                m = re.search(r"_(\d{5})\.", fn)
                out.append(
                    {
                        "round": rnd,
                        "dataset": "seen_delta",
                        "partition": (
                            f"bucket={int(m.group(1))}" if m else ""
                        ),
                        "file": fn,
                        "rows": md.num_rows,
                        "bytes": os.path.getsize(fp),
                    }
                )
        return out

    def load_lineage(self, rounds: list[int] | None = None) -> list[dict]:
        """Committed per-partition lineage rows (see _harvest_lineage).
        Rounds committed before lineage existed simply have no file."""
        out = []
        for r in (
            rounds if rounds is not None else self.committed_rounds()
        ):
            p = os.path.join(self._round_dir(r), "lineage.json")
            if os.path.exists(p):
                with open(p) as f:
                    out.extend(json.load(f))
        return out

    def lineage_df(self) -> DataFrame:
        """Lineage as a DataFrame — the queryable analogue of Iceberg's
        `.files` / `.manifests` metadata tables, joinable with
        metrics_df() on round for audit queries (rows written per
        partition per round, skew of the seen delta across buckets,
        bytes committed per round)."""
        ddl = (
            "round INT, dataset STRING, partition STRING, file STRING,"
            " rows BIGINT, bytes BIGINT"
        )
        rows = self.load_lineage()
        cols = ["round", "dataset", "partition", "file", "rows", "bytes"]
        return self.spark.createDataFrame(
            [tuple(r[c] for c in cols) for r in rows], ddl
        )
