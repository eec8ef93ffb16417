"""End-to-end plans: the KG build pipeline and the golden-metrics module."""
