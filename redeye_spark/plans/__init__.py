"""Plan-level composition: end-to-end pipeline + checkpointed execution."""
