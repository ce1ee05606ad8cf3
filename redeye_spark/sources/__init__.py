"""Sources & sinks: table IO abstraction and the synthetic data generator."""
