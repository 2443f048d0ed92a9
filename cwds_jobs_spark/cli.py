"""spark-submit entry point for the CDC engine.

Mirrors the reference's runner CLI (jobs-common/.../configuration/
JobOptions.java:132-165: ``-c`` YAML config path, ``-l`` last-run dir)
and its config loader (JobConfiguration.java:27-48: YAML + env-var
substitution + validation).  Cluster invocation::

    python tools/make_pyfiles.py                 # -> dist/cwds_jobs_spark.zip
    spark-submit --py-files dist/cwds_jobs_spark.zip \
        -m cwds_jobs_spark -c job.yaml -l /state/facility-job

Local invocation (same code path)::

    python -m cwds_jobs_spark -c job.yaml -l /tmp/state

Config keys (YAML, ``${ENV}`` substitution supported)::

    job_id: facility-cdc
    changes_dir: s3://bucket/cdc/changes     # or local path
    table_path: s3://bucket/lake/transcripts
    lineage_dir: s3://bucket/lake/_lineage   # optional
    num_buckets: 1024
    max_events_per_window: 50000000          # optional
    driver: batch | stream                   # default batch
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

from cwds_jobs_spark.runner import CdcJobRunner, JobConfig, ensure_dirs
from cwds_jobs_spark.session import get_spark

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _substitute_env(text: str) -> str:
    """``${VAR}`` -> env value; unset vars raise (reference validates
    its config bean the same way — fail at startup, not mid-run)."""

    def sub(m: re.Match) -> str:
        v = os.environ.get(m.group(1))
        if v is None:
            raise KeyError(f"config references unset env var ${{{m.group(1)}}}")
        return v

    return _ENV_RE.sub(sub, text)


def load_config(path: str, last_run_dir: str) -> tuple[JobConfig, str]:
    with open(path) as f:
        raw = _substitute_env(f.read())
    if path.endswith(".json"):
        d = json.loads(raw)
    else:
        import yaml

        d = yaml.safe_load(raw)
    required = ["job_id", "changes_dir", "table_path"]
    missing = [k for k in required if not d.get(k)]
    if missing:
        raise ValueError(f"config missing required keys: {missing}")
    return JobConfig(
        job_id=d["job_id"],
        changes_dir=d["changes_dir"],
        table_path=d["table_path"],
        state_dir=last_run_dir,
        lineage_dir=d.get("lineage_dir"),
        num_buckets=int(d.get("num_buckets", 32)),
        max_events_per_window=d.get("max_events_per_window"),
    ), d.get("driver", "batch")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="cwds_jobs_spark",
        description="PySpark CDC / incremental-ingest engine job runner",
    )
    p.add_argument("-c", "--config", required=True, help="YAML/JSON job config")
    p.add_argument("-l", "--last-run-dir", required=True,
                   help="savepoint/state dir (reference -l)")
    p.add_argument("--master", default=None,
                   help="Spark master override (default: spark-submit's)")
    args = p.parse_args(argv)

    cfg, driver = load_config(args.config, args.last_run_dir)
    ensure_dirs(cfg)
    spark = get_spark(f"cdc-{cfg.job_id}", master=args.master)
    try:
        if driver == "stream":
            from cwds_jobs_spark.streaming.driver import run_tail_once

            run_tail_once(
                spark,
                job_id=cfg.job_id,
                changes_dir=cfg.changes_dir,
                table_path=cfg.table_path,
                checkpoint_dir=os.path.join(args.last_run_dir, "checkpoint"),
                lineage_dir=cfg.lineage_dir,
                num_buckets=cfg.num_buckets,
            )
            stats = {"driver": "stream"}
        else:
            stats = CdcJobRunner(spark, cfg).run()
        print(json.dumps({k: str(v) for k, v in stats.items()}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
