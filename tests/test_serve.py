"""Serving-path tests: checkpoint restore -> jitted predictor -> probs."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from bpx.config import get_preset
from bpx.data.loaders import get_data_loaders
from bpx.serve import Predictor


@pytest.mark.slow
def test_predictor_from_checkpoint(tmp_path):
    from bpx.train.loop import train

    exp = get_preset("synthetic-tiny")
    exp = exp.replace(train=dataclasses.replace(
        exp.train, savedir=str(tmp_path), name="srv", max_epochs=1,
        gradient_accumulation_steps=2))
    train(exp)

    _, _, test_loader, _ = get_data_loaders(exp.data, exp.model, seed=0)
    batch = next(iter(test_loader))
    batch.pop("valid", None)

    pred = Predictor.from_checkpoint(
        exp, f"{tmp_path}/srv", batch, batch_size=exp.data.batch_sz)

    probs = pred(batch)
    assert probs.shape == (exp.data.batch_sz, exp.model.n_classes)
    assert ((probs >= 0) & (probs <= 1)).all()

    # ragged client batch: 3 rows, padded internally and sliced back
    small = {k: v[:3] for k, v in batch.items()}
    probs3, gates3 = pred(small, return_gates=True)
    assert probs3.shape == (3, exp.model.n_classes)
    assert gates3.shape[0] == 3
    np.testing.assert_allclose(probs3, probs[:3], atol=1e-6)

    with pytest.raises(ValueError, match="exceeds"):
        pred({k: np.repeat(v, 2, axis=0) for k, v in batch.items()})

    # warmup is AOT-only: compiles without executing
    pred.warmup(batch)

    # export round-trip: the StableHLO artifact (params baked in) must
    # serve identically with no model code, config, or checkpoint
    from bpx.serve import ExportedPredictor

    path = str(tmp_path / "model.bpx")
    blob = pred.export(batch, path)
    assert len(blob) > 0
    server = ExportedPredictor.load(path)
    assert server.batch_size == exp.data.batch_sz
    probs_x, gates_x = server(small, return_gates=True)
    np.testing.assert_allclose(probs_x, probs3, atol=1e-6)
    np.testing.assert_allclose(gates_x, gates3, atol=1e-6)

    # export CLI: run-dir (config.json + orbax best) -> artifact, dataset
    # absent on the exporting host (the example batch is synthesized)
    from bpx.cli.export import main as export_main

    out = export_main([f"{tmp_path}/srv", "--batch_size", "4"])
    cli_server = ExportedPredictor.load(out)
    assert cli_server.batch_size == 4
    probs_c = cli_server({k: v[:2] for k, v in batch.items()})
    np.testing.assert_allclose(probs_c, probs[:2], atol=1e-5)
