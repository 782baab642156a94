"""placeholder — filled in by build plan."""
