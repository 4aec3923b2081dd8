"""Offline scripts (reference `src/scripts/` equivalents): pseudo-label
generation, batch inference/eval, checkpoint conversion."""
