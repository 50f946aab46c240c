"""Query plans: the driver-facing catalog and the CDC replay pipeline."""
