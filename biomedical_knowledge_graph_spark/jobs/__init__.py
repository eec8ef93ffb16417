"""spark-submit entry points (north_rule: launched via
``spark-submit --py-files bkg.zip jobs/build_kg_job.py`` on a cluster)."""
