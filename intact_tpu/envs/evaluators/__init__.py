"""Simulator-client evaluators: connect to a policy server over websocket,
sweep checkpoints, run episodes, log intention/execution metrics."""
