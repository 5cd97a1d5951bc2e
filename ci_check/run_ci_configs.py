"""CPU e2e accuracy gate: AWQ W4A16 g128 + GPTQ W4 on a tiny synthetic
Llama, wikitext2-shaped random eval, PPL at eval positions {pretrain,
transformed, fake_quant} + token-consistency — the reference's CI shape
(/root/reference/.github/workflows/main.yml + ci_check/*.yml) without
network access (zero-egress: tiny random checkpoints instead of OPT-125M
downloads).

Exit code 0 iff both configs pass their PPL-delta asserts.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")


def run_one(cfg_name: str) -> dict:
    from helpers import make_tiny_hf_llama

    from lightcompress_tpu.config import load_config
    from lightcompress_tpu.pipeline import run_pipeline

    td = tempfile.mkdtemp()
    d, _ = make_tiny_hf_llama(td)
    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "ci", cfg_name)
    with open(cfg_path) as f:
        text = f.read().replace("__TINY_MODEL_DIR__", d)
    p = os.path.join(td, "cfg.yml")
    with open(p, "w") as f:
        f.write(text)
    cfg = load_config(p)
    cfg.save.save_path = os.path.join(td, "save")
    return run_pipeline(cfg)


def main() -> int:
    ok = True
    for cfg in ("awq_w4a16_tiny_synthetic.yml",
                "gptq_w_only_tiny_synthetic.yml"):
        r = run_one(cfg)
        fq = r["ppl_fake_quant"]
        ok &= fq == fq and fq < float("inf")
        pre = r.get("ppl_pretrain")
        delta_q = None
        if pre is not None:
            # equivalence-preserving transform: ppl unchanged within noise
            if "ppl_transformed" in r:
                ok &= abs(r["ppl_transformed"] - pre) / pre < 0.02
            # fake-quant ppl within a loose band of pretrain
            delta_q = abs(fq - pre) / pre
            ok &= delta_q < 0.25
        print(f"{cfg}: pretrain={pre} fake_quant={fq:.3f} "
              f"delta={delta_q} consistency={r.get('token_consistency')}")
    print("CI check:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
