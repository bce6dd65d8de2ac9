"""Model registry (ref: models/__init__.py:6-14).

The registry keeps the reference's public model names; ``get_model`` builds
the flax module from a :class:`bpx.config.ModelConfig`.
"""

from __future__ import annotations

from functools import partial

from bpx.config import ModelConfig
from bpx.models.bpmult import BPMulTVAPT, BPMulTVAT
from bpx.models.legacy import (BertClf, GMUBimodalClf, GMUClf, MulTGMUClf,
                               TranslatingMMTGMUClf)

MODELS = {
    # the two registered reference models (ref: models/__init__.py:8-10)
    "mmtrvapt": BPMulTVAPT,   # 4-input: video, audio, poster, text
    "mmtrvat": BPMulTVAT,     # 3-input: video, audio, text
    # earlier-generation models from the demo notebooks (SURVEY.md C30;
    # the reference registry's comment trail of superseded names,
    # models/__init__.py:7)
    "mmtrvpa": MulTGMUClf,            # MulT + GMU late fusion
    "tmmtrvpa": TranslatingMMTGMUClf,  # Translating MMT + GMU
    "gmu": GMUClf,                     # simple trimodal GMU classifier
    "gmu_bi": GMUBimodalClf,           # bimodal text+video GMU classifier
    # the GMU-proposal variants benchmarked in the DEMO_GMUs notebook
    # (cells 52/54, side-by-side runs cells 72-77)
    "gmu_hier": partial(GMUClf, gmu_variant="hierarchical"),
    "gmu_softmax": partial(GMUClf, gmu_variant="softmax"),
    # text-only BERT baseline — the notebooks' comparison-table anchor row
    # (notebook 1 cell 54 registers it as "bert"; both names accepted)
    "bertclf": BertClf,
    "bert": BertClf,
}


def get_model(config: ModelConfig):
    """Build the configured model module (ref: models/__init__.py:12-14)."""
    if config.model not in MODELS:
        raise KeyError(
            f"unknown model {config.model!r}; available: {sorted(MODELS)}")
    return MODELS[config.model](config=config)
