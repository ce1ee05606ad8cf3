"""DataFrame-level operators: the Spark side of the pipeline."""
