"""Per-stage checkpointing with lineage/metric records and resume.

BASELINE.json:6,14: "per-partition checkpoint + lineage/metric records
enabling resume after executor loss". Spark's own stage retry only
covers transient task loss; a lost driver/job loses everything
uncommitted. This module gives each pipeline stage a durable,
fingerprinted materialization:

- ``stage(df, name, fingerprint)`` writes the stage output once as
  Parquet under ``<root>/<name>/fp=<fingerprint>/`` with an atomic
  ``_COMPLETE`` marker (written only after the Parquet ``_SUCCESS``),
  plus a ``_lineage.json`` carrying per-partition metrics (one record
  per output file: rows, bytes) and wall time.
- On re-run with the same fingerprint the stage is **skipped** — the
  cached Parquet is returned and a ``resumed=True`` lineage event is
  appended, which is the resume-after-loss evidence the round's tests
  assert on (SURVEY.md §5.2 item 4).
- A fingerprint change (different input snapshot/config) invalidates
  the cache for that fingerprint only; old fingerprints remain for
  audit.
- ``stage_partitioned(df, name, fingerprint, key)`` shrinks the redo
  unit below a stage: rows are hash-sliced on ``key`` into N
  independently-committed slices, each with its own manifest
  (``_COMPLETE`` + lineage metrics). Resume recomputes ONLY the
  missing slices — and all of them in ONE upstream pass (a single
  ``isin`` filter + partitionBy write), not one pass per slice.

At cluster scale the same protocol runs on object storage; with an
Iceberg catalog configured the marker protocol is unnecessary
(snapshot commit is atomic) and stage outputs become Iceberg tables —
the local Parquet path keeps identical semantics via the marker file.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, root: str | os.PathLike, enabled: bool = True):
        self.root = Path(root)
        self.enabled = enabled
        self.events: list[dict] = []  # in-session log (tests introspect)

    def _stage_dir(self, name: str, fingerprint: str) -> Path:
        return self.root / name / f"fp={fingerprint}"

    def is_complete(self, name: str, fingerprint: str) -> bool:
        return (self._stage_dir(name, fingerprint) / "_COMPLETE").exists()

    def stage(self, df: DataFrame, name: str, fingerprint: str) -> DataFrame:
        """Materialize (or resume) one stage; returns the stage DataFrame
        re-read from durable storage so downstream lineage is cut."""
        spark = df.sparkSession
        if not self.enabled:
            return df
        out = self._stage_dir(name, fingerprint)
        if self.is_complete(name, fingerprint):
            self._log(name, fingerprint, resumed=True, wall_s=0.0)
            return spark.read.parquet(str(out / "data"))
        t0 = time.time()
        data_dir = out / "data"
        df.write.mode("overwrite").parquet(str(data_dir))
        wall = time.time() - t0
        partitions = self._partition_metrics(data_dir)
        lineage = {
            "stage": name,
            "fingerprint": fingerprint,
            "wall_s": round(wall, 3),
            "rows": sum(p["rows"] for p in partitions),
            "partitions": partitions,
            "resumed": False,
            "ts": time.time(),
        }
        (out / "_lineage.json").write_text(json.dumps(lineage, indent=1))
        (out / "_COMPLETE").write_text("ok\n")  # marker last => atomic-enough
        self._log(name, fingerprint, resumed=False, wall_s=wall)
        return spark.read.parquet(str(data_dir))

    def slice_states(self, name: str, fingerprint: str, num_slices: int) -> list[bool]:
        out = self._stage_dir(name, fingerprint)
        return [(out / f"s{s}" / "_COMPLETE").exists() for s in range(num_slices)]

    def stage_partitioned(
        self, df: DataFrame, name: str, fingerprint: str, key: str, num_slices: int = 16
    ) -> DataFrame:
        """Materialize a stage as ``num_slices`` independently-committed
        hash slices of ``key``; resume after loss recomputes only the
        slices whose manifest is missing (one combined pass).

        Slice membership is ``pmod(xxhash64(key), num_slices)`` —
        deterministic across runs, so a recomputed slice holds exactly
        the rows the lost one did. Slice dirs are named ``s<N>`` (no
        ``=``) so the read-back does not infer a partition column.
        """
        from pyspark.sql import functions as F

        spark = df.sparkSession
        if not self.enabled:
            return df
        out = self._stage_dir(name, fingerprint)
        # pin the slice count: resuming the same fingerprint with a
        # different modulus would mix pmod-N and pmod-M slice files and
        # silently duplicate rows on read-back
        slices_marker = out / "_SLICES"
        if slices_marker.exists():
            prior = int(slices_marker.read_text().strip())
            if prior != num_slices:
                raise ValueError(
                    f"stage '{name}' fp={fingerprint} was written with num_slices={prior}; "
                    f"resume requested {num_slices} — use the original value or a new fingerprint"
                )
        else:
            out.mkdir(parents=True, exist_ok=True)
            slices_marker.write_text(f"{num_slices}\n")
        done = self.slice_states(name, fingerprint, num_slices)
        missing = [s for s in range(num_slices) if not done[s]]
        if missing:
            t0 = time.time()
            sliced = df.withColumn("_slice", F.pmod(F.xxhash64(F.col(key)), F.lit(num_slices)))
            todo = sliced.where(F.col("_slice").isin(missing))
            inflight = out / "_inflight"
            todo.write.mode("overwrite").partitionBy("_slice").parquet(str(inflight))
            wall = time.time() - t0
            for s in missing:
                src = inflight / f"_slice={s}"
                dst = out / f"s{s}"
                if dst.exists():
                    import shutil

                    shutil.rmtree(dst)
                if src.exists():
                    os.replace(src, dst)
                else:
                    dst.mkdir(parents=True, exist_ok=True)  # empty slice
                partitions = self._partition_metrics(dst)
                (dst / "_lineage.json").write_text(
                    json.dumps(
                        {
                            "stage": name,
                            "fingerprint": fingerprint,
                            "slice": s,
                            "rows": sum(p["rows"] for p in partitions),
                            "partitions": partitions,
                            "ts": time.time(),
                        },
                        indent=1,
                    )
                )
                (dst / "_COMPLETE").write_text("ok\n")
            import shutil

            shutil.rmtree(inflight, ignore_errors=True)
            self._log(name, fingerprint, resumed=False, wall_s=wall)
            self.events[-1]["slices_recomputed"] = missing
        else:
            self._log(name, fingerprint, resumed=True, wall_s=0.0)
            self.events[-1]["slices_recomputed"] = []
        # explicit schema: an all-empty stage leaves slice dirs with no
        # parquet files, and schema inference would fail on zero files
        return (
            spark.read.schema(df.schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(out))
        )

    def _partition_metrics(self, data_dir: Path) -> list[dict]:
        import pyarrow.parquet as pq

        out = []
        for f in sorted(data_dir.glob("part-*.parquet")):
            meta = pq.read_metadata(f)
            out.append({"file": f.name, "rows": meta.num_rows, "bytes": f.stat().st_size})
        return out

    def _log(self, name: str, fingerprint: str, resumed: bool, wall_s: float) -> None:
        self.events.append({"stage": name, "fingerprint": fingerprint, "resumed": resumed, "wall_s": wall_s})

    def lineage(self, name: str, fingerprint: str) -> dict:
        return json.loads((self._stage_dir(name, fingerprint) / "_lineage.json").read_text())


def input_fingerprint(spark: SparkSession, *parts: str) -> str:
    """Cheap deterministic fingerprint for stage keys: caller-supplied
    identity parts (paths, config knobs, code version) hashed together.
    File-content hashing at 100 TB is impossible; path + snapshot id +
    spec version is the industry-standard lineage key."""
    import hashlib

    return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]
