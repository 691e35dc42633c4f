"""Fast golden-parity smoke — real golden assertions in the minutes-scale gate.

The full parity suite (12 modules marked ``slow``) costs 40+ min on this
host's single core, so the fast CI subset (``-m "not slow"``) used to carry
zero golden signal: a regression in kernel or layer math surfaced only after
a full run. This module re-runs a ~60 s cross-section of the golden tests
(fixtures from scripts/make_golden.py, generated from the reference torch
modules at /root/reference/src/backbones/) so every fast run checks:

- the positional-encoder table (reference positional_encoding.py:7-43),
- a conv block with GroupNorm + temporally-shared application
  (reference conv.py:168-200, temp_shared_block.py:18-47),
- the masked L-TAE output + attention masks (reference tae.py:451-504),
- att_group temporal aggregation (reference temporal_aggregator.py:21-45),
- a full TimeUNet_v1 forward THROUGH the torch->JAX checkpoint converter
  (reference timeunet.py:169-210) — end-to-end layer math + name mapping.

The wrapped functions live in the slow modules; module-level ``pytestmark``
marks only their own items, so these re-exports stay in the fast set.
"""
from tests import test_layers_parity as _layers
from tests import test_ltae_parity as _ltae


def test_smoke_positional_encoder():
    _ltae.test_positional_encoder()


def test_smoke_conv_block_group():
    _layers.test_conv_block_group()


def test_smoke_ltae_golden():
    _ltae.test_ltae()


def test_smoke_aggregator_att_group():
    _ltae.test_aggregator_att_group()


def test_smoke_timeunet_full_via_torch_converter():
    _ltae.test_timeunet_full()
