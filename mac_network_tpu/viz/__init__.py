"""Post-hoc attention visualization (reference: visualization.py)."""
