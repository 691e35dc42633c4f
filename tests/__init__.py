# Regular package so `from tests import test_layers_parity` (the fast
# golden-smoke re-exports) resolves under a bare `pytest` invocation too,
# not only under `python -m pytest tests/` from the repo root (ADVICE r3).
