"""Download calibration datasets to disk (reference
tools/download_calib_dataset.py) so TPU workers without egress can read
them via ``calib.path`` in the YAML config.  Run this on an
internet-connected host; the zero-egress sandbox can't fetch (tests build
tiny on-disk datasets instead, tests/helpers.py)."""

import argparse
import logging
import os

log = logging.getLogger("lightcompress_tpu.tools")

# dataset key -> (load_dataset args, kwargs)
CALIB_SETS = {
    "pileval": (("mit-han-lab/pile-val-backup",),
                {"split": "validation"}),
    "c4": (("allenai/c4",),
           {"data_files": {"train": "en/c4-train.00000-of-01024.json.gz"},
            "split": "train"}),
    "wikitext2": (("wikitext", "wikitext-2-raw-v1"), {"split": "train"}),
    "ptb": (("ptb_text_only", "penn_treebank"),
            {"split": "train", "trust_remote_code": True}),
    "ultrachat": (("HuggingFaceH4/ultrachat_200k",),
                  {"split": "train_sft"}),
}


def download(names, path, sets=CALIB_SETS):
    from datasets import load_dataset

    for name in names:
        if name not in sets:
            raise ValueError(f"unknown dataset {name}; have {sorted(sets)}")
        args, kwargs = sets[name]
        ds = load_dataset(*args, **kwargs)
        ds.save_to_disk(os.path.join(path, name))
        log.info("downloaded %s -> %s", name, os.path.join(path, name))


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", type=str, nargs="*",
                   default=list(CALIB_SETS))
    p.add_argument("--save_path", type=str, required=True)
    a = p.parse_args()
    download(a.dataset_name, a.save_path)
