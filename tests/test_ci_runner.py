"""CI runner units: metric scraping protocol + config preparation.

(The full subprocess path needs a live backend; these pin the pieces the
report's correctness rests on.)
"""
import importlib.util
import sys
from pathlib import Path

import yaml

_spec = importlib.util.spec_from_file_location(
    "ci_run_experiment",
    Path(__file__).resolve().parent.parent / "ci" / "run_experiment.py")
ci = importlib.util.module_from_spec(_spec)
sys.modules["ci_run_experiment"] = ci
_spec.loader.exec_module(ci)


class TestMetricScrape:
    def test_regex_matches_trainer_protocol(self):
        m = ci.METRIC_RE.match("train_psnr=23.762;")
        assert m and float(m.group(2)) == 23.762
        m = ci.METRIC_RE.match("val_loss=1e-3;")
        assert m and float(m.group(2)) == 1e-3

    def test_regex_matches_divergence(self):
        """nan/inf must be captured so a diverged run can't report the
        last finite value as its final metric."""
        for s in ("train_loss=nan;", "train_loss=-inf;", "x=+inf;"):
            m = ci.METRIC_RE.match(s)
            assert m, s
            float(m.group(2))  # parseable

    def test_regex_rejects_non_numeric(self):
        # version-like strings must not crash float(): the runner guards
        # with try/except, but the common shapes shouldn't match at all
        m = ci.METRIC_RE.match("status=done;")
        assert m is None

    def test_metrics_enabled_copy(self, tmp_path):
        src = tmp_path / "c.yaml"
        src.write_text("num_iterations: 5\nprint_metrics_to_console: false\n")
        out = ci._metrics_enabled_copy(str(src))
        cfg = yaml.safe_load(open(out))
        assert cfg["print_metrics_to_console"] is True
        assert cfg["num_iterations"] == 5
