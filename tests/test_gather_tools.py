"""Producer↔parser round-trip for the eval-log analysis tools.

The evaluator's log-line format (`BaseEvaluator._log_summary` + the
"Task suite:" marker) and the `eval_online/<sim>/<name>/step_N/ta_K/<seed>/
<timestamp>` directory layout are a de-facto API shared with the
reference's `scripts/eval/gather_*` tools (SURVEY §5.5; reference
`base_evaluator.py:160-168`, `gather_data_to_csv.py:19-76`). These tests
write logs through the PRODUCER (the evaluator's own methods) and read them
back through the PARSERS (`gather_data_to_csv`, `gather_data_delta`), so
neither side can drift without a failure here.
"""

from __future__ import annotations

import importlib.util
import logging
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_script(name: str):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / "eval" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_eval_log(root: Path, *, sim="simpler", name="pi0_bridge",
                    step=1513, ta=4, seed=42, ts="2026-08-18_10-00-00",
                    tasks: dict[str, dict[str, float]]):
    """Emit an eval.log through the evaluator's own producer methods."""
    from intact_tpu.envs.evaluators.base import BaseEvaluator
    from intact_tpu.utils.monitor import setup_logger

    d = (root / "eval_online" / sim / name / f"step_{step}" / f"ta_{ta}"
         / str(seed) / ts)
    d.mkdir(parents=True, exist_ok=True)
    logger = setup_logger(
        True, filename=str(d / "eval.log"),
        name=f"gather_test.{name}.{step}.{seed}.{ts}", force=True,
    )
    for task, metrics in tasks.items():
        logger.info("Task suite: %s", task)
        BaseEvaluator._log_summary(
            None, logger, cnt_episode=24, eval_time=60.0, metrics=metrics,
        )
    # release the file handle (one process sweeps many log dirs)
    for h in list(logger.handlers):
        h.close()
        logger.removeHandler(h)
    logging.Logger.manager.loggerDict.pop(logger.name, None)
    return d / "eval.log"


METRICS = {
    "widowx_carrot_on_plate": {
        "Success Rate": 0.5417, "Src Intention Correct": 0.7917,
        "Move Correct": 0.6667, "Wrong Obj Attempt": 0.0833,
        "Grasp Correct": 0.625,
    },
    "widowx_carrot_on_plate_distract": {
        "Success Rate": 0.375, "Src Intention Correct": 0.5833,
        "Move Correct": 0.5, "Wrong Obj Attempt": 0.25,
        "Grasp Correct": 0.4583,
    },
}


class TestGatherToolsRoundTrip:
    def test_producer_to_csv_rows(self, tmp_path):
        """_log_summary output parses back to the exact metric values
        (2-decimal-percent precision) under the directory contract."""
        _write_eval_log(tmp_path, tasks=METRICS)
        csv_mod = _load_script("gather_data_to_csv")

        rows = csv_mod.gather(tmp_path / "eval_online")
        assert rows, "parser found no rows under the producer's layout"
        by_key = {(r["task"], r["metric"]): r for r in rows}
        for task, metrics in METRICS.items():
            for metric, value in metrics.items():
                r = by_key[(task, metric)]
                # producer prints {:.2%} -> parser recovers to 1e-4
                assert r["value"] == pytest.approx(value, abs=5.1e-5)
                assert (r["simulator"], r["name"], r["step"], r["ta"],
                        r["seed"]) == ("simpler", "pi0_bridge", 1513, 4, 42)
        # bookkeeping lines are excluded, never parsed as metrics
        assert not any(r["metric"] in ("Number of episodes",
                                       "Total Task Eval Time") for r in rows)

    def test_latest_timestamp_wins(self, tmp_path):
        one_task = {"widowx_carrot_on_plate": {"Success Rate": 0.25}}
        _write_eval_log(tmp_path, ts="2026-08-18_09-00-00", tasks=one_task)
        _write_eval_log(
            tmp_path, ts="2026-08-18_11-00-00",
            tasks={"widowx_carrot_on_plate": {"Success Rate": 0.75}},
        )
        csv_mod = _load_script("gather_data_to_csv")
        rows = [r for r in csv_mod.gather(tmp_path / "eval_online")
                if r["metric"] == "Success Rate"]
        assert len(rows) == 1
        assert rows[0]["value"] == pytest.approx(0.75, abs=5.1e-5)

    def test_delta_vs_base_task(self, tmp_path):
        """compute_deltas maps the perturbed variant to its base task and
        reports the success-rate cost."""
        _write_eval_log(tmp_path, tasks=METRICS)
        csv_mod = _load_script("gather_data_to_csv")
        delta_mod = _load_script("gather_data_delta")

        rows = csv_mod.gather(tmp_path / "eval_online")
        # gather_data_delta consumes the CSV's string-typed rows
        str_rows = [{k: str(v) for k, v in r.items()} for r in rows]
        deltas = delta_mod.compute_deltas(str_rows, metric="Success Rate")
        assert len(deltas) == 1
        d = deltas[0]
        assert d["task"] == "widowx_carrot_on_plate_distract"
        assert d["base_task"] == "widowx_carrot_on_plate"
        assert d["delta"] == pytest.approx(0.375 - 0.5417, abs=1.1e-4)

    def test_csv_vis_wandb_cli_chain(self, tmp_path, monkeypatch):
        """The full analysis chain as the CLIs run it: eval.log tree ->
        gather_data_to_csv --out -> experiment_vis --out png (checkpoint
        curves need >1 step) -> gather_data_to_wandb (no-op gate here)."""
        _write_eval_log(tmp_path, step=1513, tasks=METRICS)
        _write_eval_log(
            tmp_path, step=3026, ts="2026-08-18_12-00-00",
            tasks={t: {k: min(v + 0.1, 1.0) for k, v in m.items()}
                   for t, m in METRICS.items()},
        )
        out_csv = tmp_path / "results.csv"
        csv_mod = _load_script("gather_data_to_csv")
        monkeypatch.setattr("sys.argv", [
            "gather", "--log-root", str(tmp_path / "eval_online"),
            "--out", str(out_csv),
        ])
        assert csv_mod.main() == 0
        assert out_csv.exists()

        vis_mod = _load_script("experiment_vis")
        out_png = tmp_path / "vis.png"
        monkeypatch.setattr("sys.argv", [
            "vis", "--csv", str(out_csv), "--out", str(out_png),
        ])
        assert vis_mod.main() == 0
        assert out_png.stat().st_size > 1000  # a real rendered figure

        wandb_mod = _load_script("gather_data_to_wandb")
        monkeypatch.setattr("sys.argv", ["wandb", "--csv", str(out_csv)])
        assert wandb_mod.main() == 0

    def test_delta_mapping_targets_exist_in_task_suite(self):
        """Every task in the delta table (both sides) is a real task name
        from the probing suite, so the analysis can never silently match
        nothing after a task rename."""
        from intact_tpu.envs import tasks

        delta_mod = _load_script("gather_data_delta")
        known = set(tasks.FULL_SUITE)
        for task, base in delta_mod.DELTA_MAPPING.items():
            assert task in known, task
            assert base in known, base
