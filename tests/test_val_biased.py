import numpy as np
import pandas as pd
import pytest
from pathlib import Path
from PIL import Image

import saspa_tpu.fgvc.val_biased as VB


class StubBiasedFiles:
    dataset_name = "planes-biased"

    def __init__(self, root):
        rows = []
        self.image_files = []
        self.labels = []
        rng = np.random.RandomState(0)
        for i, (plane, ground) in enumerate([
            ("Boeing", "grass"), ("Boeing", "road"),  # road Boeing = OOD
            ("Airbus", "road"), ("Airbus", "grass"),  # grass Airbus = OOD
        ]):
            p = root / f"bi{i}.jpg"
            Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(p)
            rows.append({"Plane": plane, "Ground": ground, "Filename": str(p),
                         "Label": 1 if plane == "Boeing" else 0, "Split": "test"})
            self.image_files.append(str(p))
            self.labels.append(rows[-1]["Label"])
        self.df = pd.DataFrame(rows)
        self.classes = ["airbus", "boeing"]

    @property
    def num_classes(self):
        return 2


def test_ood_flags_rule(tmp_path):
    files = StubBiasedFiles(tmp_path)
    flags = VB._ood_flags(files)
    # Boeing/road and Airbus/grass are OOD
    assert flags.tolist() == [0, 1, 0, 1]


def test_evaluate_checkpoint_with_stub(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from saspa_tpu.models.cal import WSDAN_CAL
    from saspa_tpu.utils.checkpoint import save_checkpoint

    files = StubBiasedFiles(tmp_path)
    monkeypatch.setattr(VB, "PlanesBiasedFiles", lambda split: files)

    # save a random-init checkpoint to restore
    model = WSDAN_CAL(num_classes=2, M=32, net="resnet50", dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)), train=False)
    ck = tmp_path / "ckpt"
    # training checkpoints always carry BN running stats; strict restore now
    # rejects a checkpoint without them (init-value stats print garbage)
    save_checkpoint(str(ck), variables["params"], batch_stats=variables["batch_stats"])

    result = VB.evaluate_checkpoint(str(ck), net="resnet50", batch_size=4)
    assert result["n_id"] == 2 and result["n_ood"] == 2
    for k in ("mean_class_acc", "overall_acc", "id_acc", "ood_acc"):
        assert 0.0 <= result[k] <= 100.0
