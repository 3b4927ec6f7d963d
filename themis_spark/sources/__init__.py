"""Table IO abstraction + deterministic synthetic source tables."""
