"""Challenge evaluation package (reference evaluation/): scoring harness and
the submission agent API."""
