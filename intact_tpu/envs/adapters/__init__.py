"""Env adapters: simulator obs dict -> model inputs, model actions -> sim
actions. Pure numpy/cv2 — these run on the serving host, never on TPU."""
