"""Per-stage / per-partition lineage manifests and checkpoint-resume.

Generalizes the reference's only incremental mechanism — the mtime staleness
check (`any sourceModified > quadsModified ⇒ rebuild`,
/root/reference/docs/scripts/document.js:129-143) — into explicit stage
manifests (SURVEY §4.3):

* every pipeline stage writes its output under
  ``<out_dir>/<stage>/`` and, on success, a ``<out_dir>/<stage>/MANIFEST.json``
  recording the input fingerprint, row/triple counts, wall time and the
  output files (lineage);
* a stage is SKIPPED on re-run when its manifest exists and its recorded
  input fingerprint matches the current inputs — stage boundaries are the
  checkpoint points required by the north rule;
* writes are atomic: the stage writes into ``<stage>.tmp/`` and renames to
  ``<stage>/`` before the manifest is written, so a killed run never leaves
  a half-written stage that looks complete.

This is driver-side orchestration state only — no Ray objects held here.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field

__all__ = ["StageManifest", "fingerprint_paths", "StageRunner"]

MANIFEST_NAME = "MANIFEST.json"


def fingerprint_paths(paths: list[str], params: dict | None = None) -> str:
    """Deterministic fingerprint of a set of input files: sorted
    (path, size, mtime_ns) — the reference's mtime check, hardened.

    ``params`` mixes the stage's BEHAVIORAL parameters (thresholds,
    shard counts, probe lists) into the fingerprint: a checkpoint that
    only fingerprints inputs is parameter-blind — re-running with a
    changed threshold against the same out dir would silently return
    the stale output with exit 0. Canonical JSON (sorted keys) so dict
    ordering can't perturb the hash."""
    h = hashlib.blake2b(digest_size=16)
    for p in sorted(paths):
        try:
            st = os.stat(p)
            h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
        except FileNotFoundError:
            h.update(f"{p}|missing\n".encode())
    if params:
        h.update(b"params|")
        h.update(
            json.dumps(params, sort_keys=True, default=str).encode()
        )
    return h.hexdigest()


@dataclass
class StageManifest:
    stage: str
    input_fingerprint: str
    status: str = "done"
    rows_out: int = 0
    wall_sec: float = 0.0
    output_files: list[str] = field(default_factory=list)
    extra: dict = field(default_factory=dict)
    written_at: float = 0.0

    def write(self, stage_dir: str) -> None:
        self.written_at = time.time()
        tmp = os.path.join(stage_dir, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2)
        os.replace(tmp, os.path.join(stage_dir, MANIFEST_NAME))

    @staticmethod
    def read(stage_dir: str) -> "StageManifest | None":
        path = os.path.join(stage_dir, MANIFEST_NAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            data = json.load(f)
        return StageManifest(**data)


class StageRunner:
    """Runs stages with skip-if-done semantics and atomic output dirs.

    Usage::

        runner = StageRunner(out_dir)
        def build(stage_dir):           # write outputs under stage_dir
            ds.write_parquet(stage_dir)
            return row_count, extra_dict
        runner.run("extract", input_paths, build)
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.log: list[str] = []

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def is_done(
        self, stage: str, input_paths: list[str],
        params: dict | None = None,
    ) -> bool:
        m = StageManifest.read(self.stage_dir(stage))
        return (
            m is not None
            and m.status == "done"
            and m.input_fingerprint == fingerprint_paths(input_paths, params)
        )

    def run(
        self, stage: str, input_paths: list[str], build,
        params: dict | None = None,
    ) -> str:
        """Execute ``build(tmp_dir) -> (rows_out, extra)`` unless the stage
        is already done for these inputs AND parameters (``params`` = the
        stage's behavioral knobs; changing one invalidates the
        checkpoint). Returns the stage dir."""
        final_dir = self.stage_dir(stage)
        if self.is_done(stage, input_paths, params):
            self.log.append(f"skip {stage} (checkpoint hit)")
            return final_dir
        tmp_dir = final_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)
        os.makedirs(tmp_dir)
        t0 = time.perf_counter()
        # pipeline counter deltas (dropped LSH buckets, codec fallbacks,
        # …) are lineage: a stage that capped work must SAY so in its
        # manifest (no-silent-caps rule). Best-effort — a stage that
        # never touched Ray still manifests fine.
        try:
            from .. import metrics as _metrics

            counters_before = _metrics.snapshot()
        except Exception:
            counters_before = None
        rows_out, extra = build(tmp_dir)
        if counters_before is not None:
            try:
                d = _metrics.delta(counters_before, _metrics.snapshot())
                if d:
                    extra = dict(extra or {}, counters=d)
            except Exception:
                pass
        os.replace(tmp_dir, final_dir)
        outputs = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(final_dir)
            for f in fs
        )
        StageManifest(
            stage=stage,
            input_fingerprint=fingerprint_paths(input_paths, params),
            rows_out=int(rows_out),
            wall_sec=time.perf_counter() - t0,
            output_files=[os.path.relpath(p, final_dir) for p in outputs],
            extra=extra or {},
        ).write(final_dir)
        self.log.append(f"ran {stage}: {rows_out} rows")
        return final_dir
