"""SURVEY §5 observability + failure-detection subsystems: the metrics
registry, engine runtime counters, and the fault-tolerant suite runner
(reference tests/test_utils.py:16-58 hang-kill/retry semantics)."""

import logging
import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from sgl_kernel_tpu.models import llama
from sgl_kernel_tpu.models.llama import LlamaConfig
from sgl_kernel_tpu.serving.engine import Engine
from sgl_kernel_tpu.utils.metrics import Metrics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))
import run_suite  # noqa: E402


class TestMetrics:
    def test_counters_gauges_timers(self):
        m = Metrics()
        m.inc("a")
        m.inc("a", 4)
        m.set_gauge("g", 2.5)
        m.observe("t", 0.010)
        m.observe("t", 0.030)
        s = m.snapshot()
        assert s["a"] == 5
        assert s["g"] == 2.5
        assert s["t_count"] == 2
        np.testing.assert_allclose(s["t_mean_ms"], 20.0)
        assert s["t_max_ms"] == 30.0
        # ewma: first obs seeds, second blends 0.9/0.1
        np.testing.assert_allclose(s["t_ewma_ms"], 0.9 * 10 + 0.1 * 30)

    def test_time_context(self):
        m = Metrics()
        with m.time("x"):
            pass
        assert m.timers["x"].count == 1

    def test_log_line_smoke(self):
        m = Metrics()
        m.inc("scheduler_steps", 3)
        m.inc("tokens_decoded", 12)
        line = m.log_line()
        assert "scheduler_steps=3" in line and "tokens_decoded=12" in line


class TestEngineMetrics:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = LlamaConfig.tiny()
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def test_engine_counters(self, setup):
        cfg, params = setup
        eng = Engine(cfg, params, max_batch=2, num_pages=64, page_size=16,
                     prefill_bucket=16)
        prompt = list(range(2, 12))
        eng.add_request(prompt, max_new_tokens=6)
        eng.add_request(prompt, max_new_tokens=6)  # same prompt: prefix hit
        eng.run_until_done()
        s = eng.metrics.snapshot()
        assert s["requests_admitted"] == 2
        assert s["requests_finished"] == 2
        assert s["tokens_decoded"] >= 10  # 2 x (6 new - 1 from prefill)
        assert s["scheduler_steps"] >= 5
        assert s["step_count"] == s["scheduler_steps"]
        assert s["tokens_prefilled"] >= len(prompt)
        assert "decode_tok_per_s" in s
        assert s["free_pages"] > 0

    def test_prefix_cache_hit_counter(self, setup):
        cfg, params = setup
        eng = Engine(cfg, params, max_batch=1, num_pages=64, page_size=4,
                     prefill_bucket=16)
        if eng.native is None:
            pytest.skip("native radix cache unavailable")
        prompt = list(range(2, 22))
        eng.add_request(prompt, max_new_tokens=4)
        eng.run_until_done()
        assert eng.metrics.counters.get("prefix_cache_hit_tokens", 0) == 0
        eng.add_request(prompt, max_new_tokens=4)
        eng.run_until_done()
        # second identical prompt reuses page-aligned prefix KV
        assert eng.metrics.counters["prefix_cache_hit_tokens"] >= 4

    def test_log_every(self, setup, caplog):
        cfg, params = setup
        eng = Engine(cfg, params, max_batch=1, num_pages=32, page_size=16,
                     prefill_bucket=16, log_every=1)
        eng.add_request([3, 4, 5], max_new_tokens=3)
        with caplog.at_level(logging.INFO, logger="sgl_kernel_tpu"):
            eng.run_until_done()
        assert any("scheduler_steps=" in r.message for r in caplog.records)


class TestSuiteRunner:
    def test_shard_partition_covers_all(self):
        files = [f"test_{i}.py" for i in range(7)]
        shards = [[] for _ in range(3)]
        loads = [0.0] * 3
        for f in sorted(files, key=lambda f: -run_suite.WEIGHTS.get(f, 3)):
            i = loads.index(min(loads))
            shards[i].append(f)
            loads[i] += run_suite.WEIGHTS.get(f, 3)
        got = sorted(x for s in shards for x in s)
        assert got == sorted(files)

    def test_hang_kill_and_retry_classification(self, tmp_path):
        # a file that sleeps forever must be SIGKILLed by group and
        # classified as an infra failure (rc < 0)
        hang = tmp_path / "hang.py"
        hang.write_text("import time\ntime.sleep(60)\n")
        rc = run_suite.run_file(str(hang), str(tmp_path), timeout=2.0)
        assert rc < 0

    def test_clean_failure_not_retried(self, tmp_path, monkeypatch):
        # pytest rc > 0 (real test failure) must not trigger retries
        calls = []
        monkeypatch.setattr(run_suite, "run_file",
                            lambda p, r, t: calls.append(1) or 1)
        rc = run_suite.run_with_retries("x.py", ".", 1.0)
        assert rc == 1 and len(calls) == 1

    def test_signal_death_retried(self, tmp_path, monkeypatch):
        seq = iter([-9, 0])
        monkeypatch.setattr(run_suite, "run_file", lambda p, r, t: next(seq))
        monkeypatch.setattr(run_suite, "device_healthy", lambda root: True)
        monkeypatch.setattr(run_suite.time, "sleep", lambda s: None)
        rc = run_suite.run_with_retries("x.py", ".", 1.0)
        assert rc == 0

    def test_device_health_probe(self):
        assert run_suite.device_healthy(ROOT)


def test_runner_end_to_end(tmp_path):
    """Full runner loop over a synthetic tests/ dir: one passing file, one
    hanging file that passes on retry (the infra-retry contract)."""
    tests = tmp_path / "tests"
    tests.mkdir()
    (tests / "test_ok.py").write_text("def test_a():\n    assert True\n")
    marker = tmp_path / "ran_once"
    # marker written at import (collection) time so the first attempt counts
    # even if the hang-kill fires before the test body runs
    (tests / "test_flaky.py").write_text(textwrap.dedent(f"""
        import os, time
        m = {str(marker)!r}
        first = not os.path.exists(m)
        if first:
            open(m, "w").close()
        def test_b():
            if first:
                time.sleep(300)
    """))
    # run_suite globs tests/ relative to its own file -> copy it next to
    # the synthetic tests dir
    import shutil

    (tmp_path / "tools").mkdir()
    shutil.copy(os.path.join(ROOT, "tools", "run_suite.py"),
                tmp_path / "tools" / "run_suite.py")
    env = dict(os.environ, SGL_KERNEL_TPU_INFRA_RETRIES="1",
               SGL_KERNEL_TPU_RECOVER_WAIT="0.1")
    r = subprocess.run(
        [sys.executable, str(tmp_path / "tools" / "run_suite.py"),
         "--timeout", "30"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
    )
    assert "suite OK" in r.stdout, r.stdout + r.stderr
    assert "RETRY 1/1 test_flaky.py" in r.stdout
