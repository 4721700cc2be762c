"""Cross-layer utilities: geometry, logging/timers, seeding, metrics."""
