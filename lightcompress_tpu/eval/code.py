"""HumanEval-style code-generation pass@k (llmc eval/eval_code.py, 149 LoC).

Problems are supplied as dicts {task_id, prompt, test, entry_point} (the
HumanEval JSONL schema) — loaded from disk in the zero-egress environment.
Completions come from the serving engine; scoring executes the candidate
against the unit test in a subprocess with a timeout.  Execution of
generated code only happens when ``allow_execution=True``.
"""

from __future__ import annotations

import itertools
import json
import subprocess
import sys
import tempfile
from typing import Dict, List, Optional, Sequence

import numpy as np


def load_problems(path: str) -> List[Dict]:
    problems = []
    with open(path) as f:
        for line in f:
            if line.strip():
                problems.append(json.loads(line))
    return problems


def pass_at_k(n: int, c: int, k: int) -> float:
    """Unbiased pass@k estimator (Codex paper)."""
    if n - c < k:
        return 1.0
    return 1.0 - float(np.prod(1.0 - k / np.arange(n - c + 1, n + 1)))


def check_correctness(problem: Dict, completion: str,
                      timeout: float = 5.0) -> bool:
    """Run candidate + unit tests in a subprocess."""
    program = (
        problem["prompt"] + completion + "\n" + problem["test"] + "\n"
        + f"check({problem['entry_point']})\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(program)
        path = f.name
    try:
        r = subprocess.run(
            [sys.executable, path], timeout=timeout,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


class HumanEvalRunner:
    def __init__(self, model, wspec=None, n_samples: int = 1, k: Sequence[int] = (1,),
                 max_new_tokens: int = 256, allow_execution: bool = False):
        self.model = model
        self.wspec = wspec
        self.n_samples = n_samples
        self.k = list(k)
        self.max_new_tokens = max_new_tokens
        self.allow_execution = allow_execution

    def generate_completions(self, problems: List[Dict]) -> Dict[str, List[str]]:
        from .harness import CustomGenerate
        from ..serving import SamplingParams

        gen = CustomGenerate(self.model, wspec=self.wspec,
                             max_new_tokens=self.max_new_tokens)
        sampling = SamplingParams(
            max_new_tokens=self.max_new_tokens,
            temperature=0.2 if self.n_samples > 1 else 0.0,
        )
        out: Dict[str, List[str]] = {}
        for p in problems:
            texts = gen.generate([p["prompt"]] * self.n_samples, sampling)
            out[p["task_id"]] = [
                t if isinstance(t, str) else "" for t in texts
            ]
        return out

    def evaluate(self, problems: List[Dict]) -> Dict[str, float]:
        if not self.allow_execution:
            raise RuntimeError(
                "HumanEval scoring executes generated code; pass "
                "allow_execution=True to confirm"
            )
        completions = self.generate_completions(problems)
        results = {}
        for kk in self.k:
            vals = []
            for p in problems:
                cands = completions[p["task_id"]]
                c = sum(check_correctness(p, comp) for comp in cands)
                vals.append(pass_at_k(len(cands), c, kk))
            results[f"pass@{kk}"] = float(np.mean(vals))
        return results
