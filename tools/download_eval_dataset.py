"""Download PPL-eval datasets to disk (reference
tools/download_eval_dataset.py): same as the calib downloader but the
test/validation splits consumed by ``eval.path``."""

import argparse
import logging

from download_calib_dataset import download

log = logging.getLogger("lightcompress_tpu.tools")

EVAL_SETS = {
    "c4": (("allenai/c4",),
           {"data_files": {
               "validation": "en/c4-validation.00000-of-00008.json.gz"},
            "split": "validation"}),
    "wikitext2": (("wikitext", "wikitext-2-raw-v1"), {"split": "test"}),
    "ptb": (("ptb_text_only", "penn_treebank"),
            {"split": "test", "trust_remote_code": True}),
}


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", type=str, nargs="*",
                   default=list(EVAL_SETS))
    p.add_argument("--save_path", type=str, required=True)
    a = p.parse_args()
    download(a.dataset_name, a.save_path, sets=EVAL_SETS)
