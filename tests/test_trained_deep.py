"""Regression pinned to the DEEP trained fixture (round-5 task 2).

tests/fixtures/trained_deep/ is an 18-decoder-layer (reference decoder
depth), 33.5M-param Dia trained to CE 0.23 by
`tools/make_trained_fixture.py --preset deep` through the complete in-repo
pipeline.  Quantization error compounds per layer and layer-skip speculative
drafts discard a FRACTION of depth, so the quant/speculative numbers from
the 4-layer fixture extrapolate with unknown sign; the depth-matched gates
(QUALITY.json / QAT.json next to the fixture, run by tools/quality_gates.py
and tools/qat_recover.py) are the decision-grade in-environment evidence.
These tests pin that the checkpoint stays trained and greedy-deterministic.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "trained_deep"

pytestmark = pytest.mark.skipif(
    not (FIXTURE / "golden.npz").exists(), reason="deep fixture not built"
)


@pytest.fixture(scope="module")
def deep():
    from dia_tts_prune_tpu.api import Dia

    dia = Dia.from_pretrained(str(FIXTURE))
    golden = np.load(FIXTURE / "golden.npz")
    meta = json.loads((FIXTURE / "FIXTURE.json").read_text())
    return dia, golden, meta


def test_deep_fixture_shape_and_training(deep):
    import jax.numpy as jnp

    from dia_tts_prune_tpu.train import compute_loss

    dia, golden, meta = deep
    assert dia.config.model.decoder.n_layer == 18  # the point of the preset
    batch = {k[len("batch_"):]: jnp.asarray(golden[k]) for k in golden.files
             if k.startswith("batch_")}
    loss = float(compute_loss(dia.params, dia.config, batch))
    assert loss < 1.0, f"deep fixture looks untrained: CE={loss:.3f}"
    assert abs(loss - meta["heldout_batch_loss_fp16_roundtrip"]) < 0.05


def test_deep_greedy_tokens_match_golden(deep):
    dia, golden, meta = deep
    codes = dia.generate_codes(meta["prompt"], temperature=0.0, seed=meta["seed"])
    np.testing.assert_array_equal(codes, golden["tokens"])
