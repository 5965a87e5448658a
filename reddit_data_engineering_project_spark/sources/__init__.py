"""External-source connectors (reference R1 production path)."""
