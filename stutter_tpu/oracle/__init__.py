"""NumPy reference oracle (CPU baseline + golden-parity cross-check)."""
