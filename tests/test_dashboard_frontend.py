"""Interactive dashboard frontend: served assets + the API contract the
single-page app consumes.

The reference ships a 3,924-line Leaflet/Three.js app
(reference: dashboard/static/js/dashboard.js:1-3924,
dashboard/templates/dashboard.html:1-605); ours is a zero-egress vanilla-JS
canvas app (deepearth_tpu/serving/static/). These tests assert (a) the DOM
the app builds on is served at '/', (b) the assets are self-contained — no
CDN/network references, (c) every route the JS fetches returns exactly the
field names the JS destructures, against a live HTTP server.
"""

import json
import re
import urllib.request

import numpy as np
import pytest

from deepearth_tpu.data import convert_arrays_to_store
from deepearth_tpu.serving import DashboardServer, DataService
from test_serving_data_engine import make_dataset


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("frontend")
    ds = make_dataset(60, seed=3)
    cols = ds.columns()
    ids = cols["gbif_id"]
    rng = np.random.default_rng(4)
    # species-structured embeddings so ecosystems/umap have signal
    proto = rng.standard_normal((3, 2, 4, 4, 16))
    vis = (
        proto[cols["species"]]
        + 0.05 * rng.standard_normal((60, 2, 4, 4, 16))
    ).astype(np.float32)
    vloader = convert_arrays_to_store(str(tmp / "v"), ids, vis)
    service = DataService(
        observations=cols,
        vision_loader=vloader,
        config={
            "dataset": "synthetic",
            "species_names": {"0": "Quercus", "1": "Pinus", "2": "Acer"},
        },
    )
    srv = DashboardServer(service, port=0).start()
    yield f"http://127.0.0.1:{srv.port}"
    srv.stop()


def get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        ctype = r.headers["Content-Type"]
        body = r.read()
    return ctype, body


def get_json(base, path):
    ctype, body = get(base, path)
    assert "json" in ctype
    return json.loads(body)


class TestServedAssets:
    def test_index_is_the_app(self, server):
        ctype, body = get(server, "/")
        html = body.decode()
        assert ctype.startswith("text/html")
        # the DOM the app builds on — one id per major view
        for eid in [
            'id="map"', 'id="species-table-body"', 'id="feature-canvas"',
            'id="embedding-canvas"', 'id="eco-table-body"',
            'id="total-observations"', 'id="species-filter"',
            'id="observation-panel"', 'id="tabs"', 'id="progress-banner"',
        ]:
            assert eid in html, f"missing {eid}"
        assert '/ui/app.js' in html and '/ui/style.css' in html

    def test_assets_served_and_self_contained(self, server):
        ctype_js, js = get(server, "/ui/app.js")
        assert "javascript" in ctype_js
        ctype_css, css = get(server, "/ui/style.css")
        assert "css" in ctype_css
        _, html = get(server, "/")
        # zero egress: no external URLs anywhere in the served assets
        for blob in (js, css, html):
            assert b"https://" not in blob and b"http://" not in blob
        # no framework/CDN imports
        assert b"import " not in js.splitlines()[0]

    def test_ui_path_traversal_rejected(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                server + "/ui/../server.py", timeout=30
            )
        assert e.value.code == 404

    def test_js_dom_contract(self, server):
        """Every element id the JS looks up must exist in the served HTML,
        and braces/parens must balance (no JS runtime in this image — this
        is the DOM-level wiring check the app depends on)."""
        _, js_b = get(server, "/ui/app.js")
        _, html_b = get(server, "/")
        js, html = js_b.decode(), html_b.decode()
        ids = set(re.findall(r'\$\("([\w-]+)"\)', js))
        ids |= set(re.findall(r'getElementById\("([\w-]+)"\)', js))
        assert len(ids) >= 30
        missing = [i for i in ids if f'id="{i}"' not in html]
        assert not missing, f"JS references ids missing from HTML: {missing}"
        # structural sanity: balanced delimiters outside strings/comments
        stripped = re.sub(r"//[^\n]*", "", js)
        stripped = re.sub(r'"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'|`(?:[^`\\]|\\.)*`',
                          '""', stripped, flags=re.S)
        stripped = re.sub(r"/\*.*?\*/", "", stripped, flags=re.S)
        for o, c in ("{}", "()", "[]"):
            assert stripped.count(o) == stripped.count(c), f"unbalanced {o}{c}"

    def test_js_covers_all_fetched_routes(self, server):
        """Every /api path the JS fetches must exist on the server."""
        _, js = get(server, "/ui/app.js")
        routes = set(re.findall(r'"(/api/[a-z_]+)', js.decode()))
        routes |= set(re.findall(r"`(/api/[a-z_${}/]+)`", js.decode()))
        assert len(routes) >= 8  # the app really uses the API surface
        checkable = {
            "/api/health", "/api/config", "/api/species",
            "/api/species_umap_colors", "/api/progress",
            "/api/grid_statistics",
        }
        for r in checkable:
            get_json(server, r)  # 200 + JSON


class TestApiContract:
    """Field-level contract: names the JS destructures must exist."""

    def test_boot_payloads(self, server):
        health = get_json(server, "/api/health")
        assert {"status", "n_observations"} <= set(health)
        species = get_json(server, "/api/species")
        assert {"n_species", "counts"} <= set(species)
        colors = get_json(server, "/api/species_umap_colors")["colors"]
        assert all(len(v) == 3 for v in colors.values())
        obs = get_json(server, "/api/observations?limit=20000")
        o = obs["observations"][0]
        assert {"gbif_id", "lat", "lon", "species", "year"} <= set(o)
        avail = get_json(server, "/api/vision_embeddings/available")
        assert {"count", "ids"} <= set(avail)
        cfg = get_json(server, "/api/config")
        assert cfg["species_names"]["0"] == "Quercus"

    def test_map_click_roundtrip(self, server):
        """map click → /api/observation/<id> → has_vision → feature viewer."""
        obs = get_json(server, "/api/observations?limit=5")["observations"]
        detail = get_json(server, f"/api/observation/{obs[0]['gbif_id']}")
        assert detail["has_vision"] is True
        assert {"lat", "lon", "species"} <= set(detail)

    def test_feature_viewer_roundtrip(self, server):
        gid = get_json(server, "/api/vision_embeddings/available")["ids"][0]
        att = get_json(server, f"/api/attention_map/{gid}")
        a = np.asarray(att["attention"])
        assert a.shape == tuple(att["shape"]) == (4, 4)
        assert 0 <= a.min() and a.max() <= 1
        rgb = get_json(server, f"/api/features/{gid}/umap-rgb")
        assert np.asarray(rgb["rgb"]).shape == (4, 4, 3)
        pca = get_json(server, f"/api/features/{gid}/pca-raw")
        assert np.asarray(pca["components"]).shape == (4, 4, 3)
        st = get_json(server, f"/api/features/{gid}/statistics")
        assert {
            "grid", "channels", "feature_mean", "feature_std",
            "patch_norm_mean", "patch_norm_max",
        } <= set(st)

    def test_species_browser_roundtrip(self, server):
        counts = get_json(server, "/api/species")["counts"]
        sp = sorted(counts, key=counts.get)[-1]
        data = get_json(server, f"/api/species/{sp}/observations")
        assert data["count"] == counts[sp]
        assert {"gbif_id", "lat", "lon"} <= set(data["observations"][0])

    def test_embedding_explorer_payload(self, server):
        d = get_json(server, "/api/vision_umap?max_items=30&n_components=3")
        assert len(d["ids"]) == 30
        assert np.asarray(d["projection"]).shape == (30, 3)

    def test_ecosystem_payload(self, server):
        d = get_json(server, "/api/ecosystems?n_clusters=3")
        assert {"silhouette", "labels", "clusters"} <= set(d)
        cl = d["clusters"][0]
        assert {
            "cluster_id", "size", "species_purity", "dominant_species",
            "center", "radius_km",
        } <= set(cl)
        # labels key the map recolor: every labeled id is an observation
        obs_ids = {
            o["gbif_id"]
            for o in get_json(server, "/api/observations?limit=20000")[
                "observations"
            ]
        }
        assert set(map(int, d["labels"])) <= obs_ids

    def test_grid_statistics_payload(self, server):
        d = get_json(server, "/api/grid_statistics?n_bins=12")
        assert np.asarray(d["grid"]).shape == (12, 12)
        assert len(d["lat_edges"]) == 13 and len(d["lon_edges"]) == 13


class TestRound4FrontendTail:
    """Round-4 features (reference: dashboard/static/js/dashboard.js —
    image gallery ~:29-33, yearlyChart :15, animationParams :24-28)."""

    def test_gallery_dom_and_lazy_loading(self, server):
        _, html_b = get(server, "/")
        html = html_b.decode()
        for eid in [
            'id="gallery-view"', 'id="gallery-grid"', 'id="gallery-species"',
            'id="gallery-more"', 'id="gallery-status"', 'id="tab-gallery"',
        ]:
            assert eid in html, f"missing {eid}"
        _, js_b = get(server, "/ui/app.js")
        js = js_b.decode()
        # on-demand loading: tiles must NOT fetch eagerly — images get their
        # src only when scrolled into view
        assert "IntersectionObserver" in js
        assert "dataset.src" in js
        assert "image_proxy" in js

    def test_yearly_chart_dom(self, server):
        _, html_b = get(server, "/")
        assert 'id="yearly-chart"' in html_b.decode()
        _, js_b = get(server, "/ui/app.js")
        js = js_b.decode()
        assert "drawYearlyChart" in js
        # chart redraws with the map filter (counts follow the filter state)
        assert "drawYearlyChart(pts)" in js

    def test_embedding_animation(self, server):
        _, js_b = get(server, "/ui/app.js")
        js = js_b.decode()
        assert "requestAnimationFrame" in js
        assert "startEmbeddingAnimation" in js
        assert "easeInOut" in js

    def test_image_proxy_contract(self, server):
        """Gallery tiles point at /api/image_proxy/<gbif>/<n>; without a
        local image dir the route must 404 cleanly (tiles hide on error)."""
        gid = get_json(server, "/api/observations?limit=1")["observations"][0][
            "gbif_id"
        ]
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                server + f"/api/image_proxy/{gid}/1", timeout=30
            )
        assert e.value.code == 404
        assert "error" in json.loads(e.value.read())
