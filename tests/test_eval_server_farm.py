"""eval_server must dispatch checkpoints across devices via DeviceFarm
(VERDICT round-1 missing #4 — the reference farms one replica per GPU,
utils/eval_server.py:78-87, 249-263)."""

import numpy as np

import jax

from rmnet_tpu.config import Config
from rmnet_tpu.core.engine import build_models
from rmnet_tpu.utils.checkpoint import save_checkpoint
from rmnet_tpu.utils.metrics import Metrics


def test_eval_server_farms_across_devices(tmp_path, monkeypatch):
    import rmnet_tpu.core.eval_server as es

    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    cfg = Config()
    cfg.DIR.OUTPUT_DIR = str(tmp_path / "out")
    cfg.CONST.EXP_NAME = "farm"

    _, _, rm_vars, tfn_vars = build_models(cfg, 0)
    ckpt_dir = str(tmp_path / "ckpts")
    paths = []
    for i in range(4):
        paths.append(save_checkpoint(ckpt_dir, f"ckpt-epoch-{i:03d}", {
            "epoch": i, "best_metrics": None,
            "rmnet": rm_vars, "tflownet": tfn_vars, "opt_state": None,
        }))

    devices_used = []
    scored = []

    def fake_test_net(cfg_, epoch_idx, loader, writer, engine):
        leaf = jax.tree_util.tree_leaves(engine.rmnet_vars)[0]
        devices_used.append(tuple(sorted(d.id for d in leaf.devices())))
        scored.append(1)
        vals = [0.5 + 0.01 * len(scored)] * len(Metrics.names())
        return Metrics(cfg_.TEST.MAIN_METRIC_NAME, vals)

    monkeypatch.setattr(es, "test_net", fake_test_net)
    monkeypatch.setattr(
        es, "DataLoader", lambda *a, **k: []
    )
    monkeypatch.setattr(
        es.DatasetCollector, "get_dataset", staticmethod(lambda *a, **k: [])
    )

    best, scores = es.eval_server(cfg, ckpt_dir, max_iterations=1,
                                  keep_best_only=False)
    assert len(scores) == 4
    assert best is not None
    # replicas were pinned to devices; concurrent dispatch uses >1 device
    # (each engine's weights live on its worker's device)
    assert len(set(devices_used)) >= 2, devices_used
