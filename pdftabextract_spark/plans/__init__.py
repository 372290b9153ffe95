"""End-to-end extraction plans (the reference's example pipelines as single
Spark DAGs) plus checkpoint/resume bookkeeping."""
