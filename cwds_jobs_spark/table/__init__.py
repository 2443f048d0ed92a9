from cwds_jobs_spark.table.snapshot import SnapshotTable

__all__ = ["SnapshotTable"]
