"""End-to-end job plans (the GraphIngestionPipeline analogue)."""
