"""Checkpoint manifest: per-partition lineage + row-count metrics with
idempotent mid-job resume (north rule: "every partition emits lineage +
row-count metrics to a checkpoint manifest so the job resumes
idempotently mid-tiling").

Model: a long tiling/spatial-join job is split into UNITS — disjoint
cell-prefix ranges of the input (the same key the tables are clustered
by, so a unit maps to a partition-pruned scan). Each unit:

  1. runs its slice of the pipeline with an ``observe`` row-count
     metric attached (zero-cost, aggregated by Spark itself),
  2. writes output to a unit-keyed subdirectory (overwrite = idempotent
     — rerunning a unit replaces, never duplicates),
  3. appends a manifest record (unit id, predicate, row counts, output
     path, app id) — the lineage entry.

Resume = anti-join the unit list against manifest records marked
complete; only unfinished units run. Crash between 2 and 3 reruns one
unit whose overwrite makes the rerun invisible — exactly-once output
without a transaction log (an Iceberg commit would subsume 2+3 on a
real deployment; this manifest keeps the engine storage-agnostic).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession


@dataclass
class Unit:
    unit_id: str
    lo: int  # inclusive cell-x lower bound
    hi: int  # inclusive cell-x upper bound


def plan_units(cx_min: int, cx_max: int, n_units: int) -> list[Unit]:
    """Split a cell-x range into n contiguous units (lon-striped)."""
    span = cx_max - cx_min + 1
    width = max(1, span // n_units)
    units = []
    lo = cx_min
    i = 0
    while lo <= cx_max:
        hi = min(cx_max, lo + width - 1)
        units.append(Unit(f"u{i:05d}", lo, hi))
        lo = hi + 1
        i += 1
    return units


class Manifest:
    """JSONL manifest at ``path`` (append-only; last record per unit
    wins, so retries are harmless)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def completed_units(self) -> set[str]:
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "complete":
                        done.add(rec["unit_id"])
        return done

    def record(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")


def run_with_manifest(
    spark: SparkSession,
    units: list[Unit],
    run_unit: Callable[[Unit, Observation], DataFrame],
    out_dir: str,
    manifest_path: str,
) -> dict:
    """Execute every not-yet-complete unit; each writes parquet to
    ``{out_dir}/unit={unit_id}`` (idempotent overwrite) and appends a
    manifest record with observed row counts.

    ``run_unit(unit, observation)`` must attach the observation via
    ``df.observe(observation, F.count(F.lit(1)).alias("rows"))`` (or
    richer metrics) so lineage costs no extra job.
    """
    m = Manifest(manifest_path)
    done = m.completed_units()
    ran, skipped = [], []
    for u in units:
        if u.unit_id in done:
            skipped.append(u.unit_id)
            continue
        obs = Observation(f"unit_{u.unit_id}")
        df = run_unit(u, obs)
        path = os.path.join(out_dir, f"unit={u.unit_id}")
        df.write.mode("overwrite").parquet(path)
        metrics = dict(obs.get)
        m.record(
            {
                "unit_id": u.unit_id,
                "status": "complete",
                "cx_lo": u.lo,
                "cx_hi": u.hi,
                "metrics": metrics,
                "output": path,
                "app_id": spark.sparkContext.applicationId,
                "wall_ts": time.time(),
            }
        )
        ran.append(u.unit_id)
    return {"ran": ran, "skipped": skipped}
