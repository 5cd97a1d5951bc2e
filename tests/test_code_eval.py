"""HumanEval runner tests (pass@k math + end-to-end on a trivial problem)."""

import numpy as np
import pytest

from lightcompress_tpu.eval.code import check_correctness, load_problems, pass_at_k


def test_pass_at_k_math():
    assert pass_at_k(1, 1, 1) == 1.0
    assert pass_at_k(1, 0, 1) == 0.0
    assert abs(pass_at_k(10, 5, 1) - 0.5) < 1e-9
    assert pass_at_k(10, 5, 10) == 1.0


def test_check_correctness_exec():
    problem = {
        "task_id": "t/0",
        "prompt": "def add(a, b):\n",
        "test": "def check(f):\n    assert f(1, 2) == 3\n",
        "entry_point": "add",
    }
    # generous timeouts: the subprocess python startup can exceed the 5s
    # default when the machine is under heavy concurrent load
    assert check_correctness(problem, "    return a + b\n", timeout=60.0)
    assert not check_correctness(problem, "    return a - b\n", timeout=60.0)
    # infinite loop times out -> False
    assert not check_correctness(problem, "    \n    while True: pass\n",
                                 timeout=10.0)


def test_runner_requires_opt_in():
    from lightcompress_tpu.eval.code import HumanEvalRunner

    with pytest.raises(RuntimeError):
        HumanEvalRunner(None).evaluate([])


def test_load_problems(tmp_path):
    import json

    p = tmp_path / "problems.jsonl"
    p.write_text(json.dumps({"task_id": "a", "prompt": "x", "test": "t",
                             "entry_point": "f"}) + "\n")
    probs = load_problems(str(p))
    assert len(probs) == 1 and probs[0]["task_id"] == "a"
