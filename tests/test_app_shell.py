"""Headless smoke of the Streamlit app shell's 3-tab state machine.

streamlit is not baked into this image (and nothing may be installed), so
``streamlit.testing.v1.AppTest`` is unavailable; instead a minimal
fake-streamlit module implementing exactly the widget API the app uses
drives ``crop2seg_tpu/webapp/app.py`` like a scripted AppTest:
Home -> click a cell button -> predict -> Crop-map render -> Cache delete
— with the pipeline calls and CacheManager stubbed (no network, no TPU).
Reference flow: /root/reference/crop2seg.py:47-163,263-385.
"""
import importlib
import sys
import types

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest


class _Rerun(Exception):
    """Stands in for streamlit's RerunException."""


class _Col:
    """Column proxy: usable as a context manager, delegates widgets."""

    def __init__(self, st):
        self._st = st

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def __getattr__(self, name):
        return getattr(self._st, name)


class FakeStreamlit(types.ModuleType):
    """Scriptable stand-in for the streamlit module: widget values come
    from ``values`` (keyed by label), button presses from ``clicked``
    (labels or keys, consumed one-shot), and every output call is recorded
    in ``log`` as (kind, payload)."""

    def __init__(self):
        import types as _t
        super().__init__("streamlit")
        self.session_state = {}
        self.values = {}
        self.clicked = set()
        self.log = []
        self.sidebar = self
        self.components = _t.SimpleNamespace(v1=_t.SimpleNamespace(
            html=lambda html, height=None: self.log.append(
                ("html", len(html)))))

    # widgets -------------------------------------------------------------
    def radio(self, label, options, horizontal=False):
        return self.values.get(label, options[0])

    def selectbox(self, label, options, index=0):
        return self.values.get(label, options[index])

    def number_input(self, label, mn, mx, value, **kw):
        return self.values.get(label, value)

    def text_input(self, label, value=""):
        return self.values.get(label, value)

    def expander(self, label):
        return _Col(self)

    def checkbox(self, label, value=False, disabled=False):
        return bool(self.values.get(label, value)) and not disabled

    def button(self, label, key=None, type=None):
        hit = label in self.clicked or (key is not None
                                        and key in self.clicked)
        if hit:
            self.clicked.discard(label)
            self.clicked.discard(key)
        return hit

    def columns(self, spec):
        n = spec if isinstance(spec, int) else len(spec)
        return [_Col(self) for _ in range(n)]

    # output / control ----------------------------------------------------
    def set_page_config(self, **kw):
        self.log.append(("config", kw))

    def title(self, text):
        self.log.append(("title", text))

    def caption(self, text):
        self.log.append(("caption", text))

    def write(self, text):
        self.log.append(("write", text))

    def info(self, text):
        self.log.append(("info", text))

    def error(self, text):
        self.log.append(("error", text))

    def success(self, text):
        self.log.append(("success", text))

    def pyplot(self, fig):
        self.log.append(("pyplot", fig))
        plt.close(fig)

    def rerun(self):
        raise _Rerun()

    def kinds(self):
        return [k for k, _ in self.log]


class FakeCache:
    """CacheManager stand-in; records clear() calls across reruns."""

    instances = []

    def __init__(self, cache_dir):
        self.cache_dir = cache_dir
        self.cleared = []
        FakeCache.instances.append(self)

    def sizes(self):
        return {"timeseries": 1.5e6, "prediction": 2.0e6}

    def clear(self, *subdirs):
        self.cleared.extend(subdirs)


@pytest.fixture
def app(monkeypatch, tmp_path):
    fake = FakeStreamlit()
    monkeypatch.setitem(sys.modules, "streamlit", fake)
    monkeypatch.setenv("CROP2SEG_CACHE", str(tmp_path / "cache"))
    sys.modules.pop("crop2seg_tpu.webapp.app", None)
    mod = importlib.import_module("crop2seg_tpu.webapp.app")

    calls = {"get_info": [], "get_ts": [], "predict": []}
    result = {
        "classes": np.zeros((16, 16), np.int32),
        "proba": np.random.default_rng(0).random((16, 16, 15)).astype(
            np.float32),
        "homogenized": np.ones((16, 16), np.int32),
        "lpis": None,
    }

    def fake_info(tile, cell):
        calls["get_info"].append((tile, cell))
        return {"tile": tile, "cell": cell, "bounds": (0.0, 0.0, 1.0, 1.0)}

    def fake_ts(tile, bounds, cache_dir, **kw):
        calls["get_ts"].append((tile, bounds))
        return str(tmp_path / "cell")

    def fake_predict(folder, model_dir, year, cache_dir, **kw):
        calls["predict"].append((folder, year))
        return dict(result)

    monkeypatch.setattr(mod, "cell_grid_figure",
                        lambda tile, selected=None, **kw: plt.figure())
    monkeypatch.setattr(mod, "get_info", fake_info)
    monkeypatch.setattr(mod, "get_time_series", fake_ts)
    monkeypatch.setattr(mod, "generate_prediction", fake_predict)
    monkeypatch.setattr(mod, "CacheManager", FakeCache)
    FakeCache.instances = []
    yield fake, mod, calls
    sys.modules.pop("crop2seg_tpu.webapp.app", None)


def run(fake, mod, max_reruns=5):
    """Emulate streamlit's rerun loop around one script execution."""
    for _ in range(max_reruns):
        try:
            mod.main()
            return
        except _Rerun:
            continue
    raise AssertionError("app did not settle within the rerun budget")


def test_home_cell_click_then_predict(app):
    fake, mod, calls = app
    fake.values["Menu"] = "Home"
    fake.clicked = {"cell_42"}
    run(fake, mod)
    assert fake.session_state["cell"] == 42
    assert "pyplot" in fake.kinds()  # the georeferenced grid figure

    fake.clicked = {"Predict crops"}
    run(fake, mod)
    from crop2seg_tpu.config import DEFAULT_TILES
    assert calls["get_info"] == [(DEFAULT_TILES[0], 42)]
    assert calls["get_ts"] and calls["predict"]
    assert calls["predict"][0][1] == 2019  # default year flows through
    assert "success" in fake.kinds()
    assert fake.session_state["result"]["classes"].shape == (16, 16)


def test_crop_map_renders_layers(app):
    fake, mod, calls = app
    fake.values["Menu"] = "Home"
    fake.clicked = {"Predict crops"}
    run(fake, mod)

    fake.log.clear()
    fake.values["Menu"] = "Crop map"
    run(fake, mod)
    assert "pyplot" in fake.kinds()  # predicted layer through plot_crop_map

    fake.log.clear()
    fake.values["Layer"] = "LPIS-homogenized"
    fake.values["Dim low-confidence pixels"] = True
    run(fake, mod)
    assert "pyplot" in fake.kinds()


def test_crop_map_empty_state(app):
    fake, mod, _ = app
    fake.values["Menu"] = "Crop map"
    run(fake, mod)
    assert "info" in fake.kinds()       # "No prediction cached yet"
    assert "pyplot" not in fake.kinds()


def test_cache_tab_delete(app):
    fake, mod, _ = app
    fake.values["Menu"] = "Cache"
    run(fake, mod)
    assert any("timeseries" in p for k, p in fake.log if k == "write")

    fake.clicked = {"Delete timeseries"}
    run(fake, mod)
    assert any(c.cleared == ["timeseries"] for c in FakeCache.instances)


def test_locate_by_coordinates(app):
    """The WGS84 locate flow must run the closed-form spatial join
    (map_picker.pick_patch) and move the app's tile+cell selection —
    the reference's leafmap click->sjoin loop (home.py:63-77)."""
    from crop2seg_tpu.webapp.map_picker import pick_patch

    fake, mod, calls = app
    fake.values["Menu"] = "Home"
    fake.values["Latitude"], fake.values["Longitude"] = 49.6, 15.0
    fake.clicked = {"Locate"}
    run(fake, mod)
    want = pick_patch(49.6, 15.0)
    assert fake.session_state["tile"] == want["tile"]
    assert fake.session_state["cell"] == want["cell"]
    assert ("success", f"{want['tile']} cell {want['cell']}") in fake.log
    # the interactive CZ map rendered (self-contained html embed)
    assert "html" in fake.kinds()

    # out-of-grid point surfaces an error, selection unchanged
    fake.log.clear()
    fake.values["Latitude"], fake.values["Longitude"] = 38.0, 15.0
    fake.clicked = {"Locate"}
    run(fake, mod)
    assert "error" in fake.kinds()
    assert fake.session_state["tile"] == want["tile"]
