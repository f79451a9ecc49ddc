"""Snapshot tables: checkpointed, versioned, atomically-committed state
(SURVEY.md §2 ops 02/04/41).

The north star names Iceberg snapshots (BASELINE.json:6). This sandbox
has no Iceberg runtime jar (SURVEY.md §0), so the same semantics are
provided by an offline backend with the same guarantees and the same
scaling shape:

  table_root/
    d000001/part-*.parquet      (immutable data directories)
    d000002/...
    manifest.json               (single commit point, atomic rename)

- a VERSION is a manifest entry listing the data dirs it comprises —
  append commits ONE new data dir and a manifest entry referencing
  previous dirs plus the new one (O(delta) I/O, like an Iceberg
  fast-append snapshot; the table is never rewritten).
- an entry may also be PART of a dir: ``{"dir": "d000001", "parts":
  ["bucket=3", ...]}`` restricts the reference to the named hive
  partition subpaths. ``write_replacing_parts`` uses this for
  partition-level rewrites (Iceberg dynamic partition overwrite): the
  new version references the fresh dir for the replaced partitions and
  the previous dirs for everything else — untouched partitions carry
  over WITHOUT rewrite.
- ``write`` stages the new data dir first, then commits by writing
  manifest.tmp and ``os.replace``: a crash before the rename leaves the
  previous version current, so a crawl round replays idempotently.
- ``read(version=)`` is time travel; ``read()`` is the current snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str | os.PathLike,
                 name: str, schema: StructType):
        self.spark = spark
        self.dir = Path(root) / name
        self.name = name
        self.schema = schema
        self.dir.mkdir(parents=True, exist_ok=True)

    @property
    def _manifest_path(self) -> Path:
        return self.dir / "manifest.json"

    def _manifest(self) -> dict:
        if self._manifest_path.exists():
            return json.loads(self._manifest_path.read_text())
        return {"current": 0, "versions": {}, "next_dir": 1}

    def current_version(self) -> int:
        return self._manifest()["current"]

    def _commit(self, manifest: dict) -> None:
        tmp = self.dir / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest))
        os.replace(tmp, self._manifest_path)  # the atomic commit point

    def _dirs_for(self, m: dict, version: int) -> list:
        return m["versions"].get(str(version), [])

    @staticmethod
    def _entry_dir(entry) -> str:
        return entry["dir"] if isinstance(entry, dict) else entry

    def read(self, version: int | None = None) -> DataFrame:
        m = self._manifest()
        v = m["current"] if version is None else version
        # explicit time travel to a pruned/never-committed version is
        # an error (matching rollback), not a silent empty frame;
        # version 0 is the legitimate empty initial state
        if version is not None and version != 0 \
                and str(version) not in m["versions"]:
            raise ValueError(
                f"{self.name}: no version {version} to read "
                "(pruned or never committed)")
        entries = self._dirs_for(m, v)
        if not entries:
            return self.spark.createDataFrame([], self.schema)
        plain = [e for e in entries if not isinstance(e, dict)]
        dfs = []
        if plain:
            dfs.append(self.spark.read.schema(self.schema)
                       .parquet(*[str(self.dir / d) for d in plain]))
        for e in entries:
            if not isinstance(e, dict):
                continue
            paths = [str(self.dir / e["dir"] / p) for p in e["parts"]]
            if not paths:
                continue
            # basePath anchors partition-column inference at the data
            # dir, so reading only some partition subpaths still yields
            # the partition columns
            dfs.append(self.spark.read
                       .option("basePath", str(self.dir / e["dir"]))
                       .schema(self.schema).parquet(*paths))
        if not dfs:
            return self.spark.createDataFrame([], self.schema)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def write(self, df: DataFrame, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> int:
        """Commit ``df`` as a new snapshot version.

        mode="append": new version = previous dirs + one new dir
        (O(delta)); mode="overwrite": new version = the new dir only
        (old dirs stay readable for time travel until pruned).
        ``partition_by`` lays the data dir out hive-partitioned on the
        given columns (they must be in the table schema) — reads then
        statically prune on filters over those columns.
        """
        m = self._manifest()
        dname = f"d{m['next_dir']:06d}"
        ddir = self.dir / dname
        if ddir.exists():  # leftover from a crashed, uncommitted write
            shutil.rmtree(ddir)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(ddir))
        new_v = m["current"] + 1
        prev = self._dirs_for(m, m["current"]) if mode == "append" else []
        m["versions"][str(new_v)] = prev + [dname]
        m["current"] = new_v
        m["next_dir"] += 1
        self._commit(m)
        return new_v

    def write_rows(self, rows: list[tuple], mode: str = "append") -> int:
        """Commit DRIVER-HELD rows as a new snapshot version without a
        Spark job: the rows are written with pyarrow straight into the
        new data dir, then the manifest commits exactly like ``write``.

        For metadata-sized tables (per-round lineage/metrics: O(tasks)
        rows the driver already holds) this is the honest shape — an
        Iceberg writer commits its metadata driver-side too. It also
        sidesteps a measured PySpark overhead: writing a
        local-list-backed DataFrame runs the Python-RDD scan inside
        the write job (~4s fixed latency per call on this box, even
        warm — the round-4 bench's 'manifest commit' latency was
        mostly THIS), while the pyarrow write is sub-millisecond.
        Types are mapped from the table schema (the subset metadata
        tables use); reads via ``read()`` see one file exactly as if
        Spark had written it."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        _PA = {"integer": pa.int32(), "long": pa.int64(),
               "string": pa.string(), "double": pa.float64(),
               "boolean": pa.bool_(), "binary": pa.binary()}
        fields = []
        for f in self.schema.fields:
            name = f.dataType.typeName()
            if name not in _PA:
                raise TypeError(
                    f"write_rows supports flat metadata schemas only; "
                    f"{self.name}.{f.name} is {name}")
            fields.append(pa.field(f.name, _PA[name]))
        schema = pa.schema(fields)
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type)
             for c, f in zip(cols, fields)], schema=schema)

        m = self._manifest()
        dname = f"d{m['next_dir']:06d}"
        ddir = self.dir / dname
        if ddir.exists():  # leftover from a crashed, uncommitted write
            shutil.rmtree(ddir)
        ddir.mkdir(parents=True)
        pq.write_table(table, ddir / "part-00000.parquet")
        new_v = m["current"] + 1
        prev = self._dirs_for(m, m["current"]) if mode == "append" else []
        m["versions"][str(new_v)] = prev + [dname]
        m["current"] = new_v
        m["next_dir"] += 1
        self._commit(m)
        return new_v

    def read_rows(self, version: int | None = None):
        """Driver-side read of a version via pyarrow (no Spark job) —
        the read complement of ``write_rows`` for metadata-sized
        tables. Returns one pyarrow Table (column access by name;
        works on Spark-written versions too)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        m = self._manifest()
        v = m["current"] if version is None else version
        tables = []
        for e in self._dirs_for(m, v):
            base = self.dir / self._entry_dir(e)
            roots = ([base / p for p in e["parts"]]
                     if isinstance(e, dict) else [base])
            for r in roots:
                for f in sorted(Path(r).rglob("*.parquet")):
                    tables.append(pq.read_table(f))
        if not tables:
            return pa.table(
                {f.name: [] for f in self.schema.fields})
        return pa.concat_tables(tables, promote_options="permissive")

    def write_replacing_parts(self, df: DataFrame, parts: list[str],
                              partition_by: list[str]) -> int:
        """Commit a new version where ``df`` REPLACES the named hive
        partition subpaths (e.g. ``["bucket=3", "bucket=17"]``) of the
        current version; every other partition carries over BY
        REFERENCE from the previous version's dirs — the partition-
        level rewrite an Iceberg dynamic partition overwrite commits.
        ``df`` must contain only rows belonging to ``parts``."""
        m = self._manifest()
        dname = f"d{m['next_dir']:06d}"
        ddir = self.dir / dname
        if ddir.exists():  # leftover from a crashed, uncommitted write
            shutil.rmtree(ddir)
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(str(ddir))
        replaced = set(parts)
        new_entries: list = []
        for e in self._dirs_for(m, m["current"]):
            if isinstance(e, dict):
                kept = [p for p in e["parts"] if p not in replaced]
            else:
                # a whole-dir entry: enumerate its top-level partition
                # dirs so the replaced ones can be subtracted
                kept = sorted(p.name for p in (self.dir / e).iterdir()
                              if p.is_dir() and "=" in p.name
                              and p.name not in replaced)
            if kept:
                new_entries.append({"dir": self._entry_dir(e), "parts": kept})
        written = sorted(p.name for p in ddir.iterdir()
                         if p.is_dir() and "=" in p.name)
        if written:
            new_entries.append({"dir": dname, "parts": written})
        new_v = m["current"] + 1
        m["versions"][str(new_v)] = new_entries
        m["current"] = new_v
        m["next_dir"] += 1
        self._commit(m)
        return new_v

    def segment_df(self, version: int | None = None) -> DataFrame:
        """Rows appended BY ``version`` (its newest data dir only) —
        the O(delta) read used to e.g. hash a round's frontier adds
        into the bloom sidecar without re-deriving them. The dir stays
        on disk through later truncate/compact commits (only prune
        removes data), but consume it within the round that wrote it."""
        m = self._manifest()
        v = m["current"] if version is None else version
        dirs = self._dirs_for(m, v)
        if not dirs:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(
            str(self.dir / self._entry_dir(dirs[-1])))

    def n_segments(self) -> int:
        """Data dirs in the current version (== appends since the last
        overwrite/truncate) — used as a compaction trigger."""
        m = self._manifest()
        return len(self._dirs_for(m, m["current"]))

    def truncate(self) -> int:
        """Commit a new EMPTY version — a pure manifest operation (no
        Spark job); old versions stay time-travelable until pruned."""
        m = self._manifest()
        new_v = m["current"] + 1
        m["versions"][str(new_v)] = []
        m["current"] = new_v
        self._commit(m)
        return new_v

    def rollback(self, version: int) -> None:
        """Reset the current pointer to an earlier version — used on
        resume to discard table commits from a round whose crawl-level
        checkpoint never landed (makes round replay exactly-once)."""
        m = self._manifest()
        if version == m["current"]:
            return
        if version != 0 and str(version) not in m["versions"]:
            raise ValueError(f"{self.name}: no version {version} to roll back to")
        for v in [int(x) for x in m["versions"] if int(x) > version]:
            del m["versions"][str(v)]
        m["current"] = version
        self._commit(m)

    def prune(self, keep_last: int = 2) -> None:
        """Drop versions (and now-unreferenced data dirs) older than the
        last ``keep_last`` — snapshot GC."""
        m = self._manifest()
        vs = sorted(int(v) for v in m["versions"])
        keep = set(vs[-keep_last:])
        live: set[str] = set()
        for v in keep:
            live.update(self._entry_dir(e) for e in m["versions"][str(v)])
        for v in vs:
            if v not in keep:
                del m["versions"][str(v)]
        self._commit(m)
        for d in self.dir.iterdir():
            if d.is_dir() and d.name.startswith("d") and d.name not in live:
                shutil.rmtree(d)


def diff_snapshots(old: DataFrame, new: DataFrame, key_col: str,
                   compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level diff between two snapshots of the same table:
    ``(key, change)`` with change ∈ {'added', 'removed', 'changed'};
    unchanged rows are NOT emitted (at 100 TB the diff is the small
    output, the unchanged mass is the big one).

    'changed' compares an xxhash64 fingerprint of ``compare_cols``
    (default: every non-key column both sides share, name-sorted) —
    each side reduces to (key, 8-byte fingerprint) BEFORE the
    full-outer join, so wide columns (html!) never ride the shuffle.
    Typical uses: two crawl-round page snapshots -> recrawl feed; two
    corpus versions -> incremental re-dedup delta (dedup.py's
    IncrementalMinHashIndex consumes exactly the 'added' set)."""
    if compare_cols is None:
        compare_cols = sorted(
            set(old.columns) & set(new.columns) - {key_col})

    def side(df: DataFrame, tag: str) -> DataFrame:
        fp = (F.xxhash64(*[F.col(c) for c in compare_cols])
              if compare_cols else F.lit(0).cast("long"))
        return df.select(F.col(key_col).alias(f"{tag}_key"),
                         fp.alias(f"{tag}_fp"))

    o, n = side(old, "o"), side(new, "n")
    j = o.join(n, o["o_key"] == n["n_key"], "full_outer")
    change = (
        F.when(F.col("o_key").isNull(), F.lit("added"))
        .when(F.col("n_key").isNull(), F.lit("removed"))
        .when(F.col("o_fp") != F.col("n_fp"), F.lit("changed"))
    )
    return (j.select(F.coalesce("n_key", "o_key").alias(key_col),
                     change.alias("change"))
            .where(F.col("change").isNotNull()))


class Checkpoint:
    """Crawl-level checkpoint: (round counter, table versions) committed
    atomically AFTER all table writes of a round — the resume point."""

    def __init__(self, state_dir: str | os.PathLike):
        self.path = Path(state_dir) / "checkpoint.json"

    def load(self) -> dict | None:
        if self.path.exists():
            return json.loads(self.path.read_text())
        return None

    def commit(self, payload: dict) -> None:
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(payload))
        os.replace(tmp, self.path)
