"""ML pipelines: duplicate-pair classification (train / evaluate / apply)."""
