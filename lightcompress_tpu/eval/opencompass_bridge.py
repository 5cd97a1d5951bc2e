"""opencompass bridge (reference __main__.py:164-176): after compression,
shell out to opencompass with the saved transformed model.

Gated on the external ``opencompass`` CLI being installed; we save the
model in HF format first so any external harness can consume it.
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
from typing import Optional

log = logging.getLogger(__name__)


def run_opencompass(algo, config) -> Optional[int]:
    oc_cfg = config.get("opencompass", None)
    if not oc_cfg:
        return None
    if shutil.which("opencompass") is None:
        log.warning("opencompass CLI not found; skipping")
        return None
    save_dir = os.path.join(config.save.save_path, "opencompass_model")
    algo.deploy("transformed")
    algo.save_model(save_dir)
    cmd = ["opencompass", oc_cfg["cfg_path"], "--llmc_cfg", save_dir]
    log.info("running: %s", " ".join(cmd))
    return subprocess.call(cmd)
