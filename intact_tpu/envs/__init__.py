"""Environment adapters (server-side obs/action translation) and
simulator-client evaluators."""
