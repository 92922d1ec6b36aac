"""Geo keyword tests: Montpellier geofencing fixtures from
/root/reference/test/keywords/geo*.test.js + the 9 geopoint formats of
test/geopoint.test.js."""

import pytest

from koncorde_spark import Koncorde, convert_distance, convert_geopoint

# Montpellier bbox (geoBoundingBox.test.js:10-25)
BOX = {"top": 43.6331979, "left": 3.8433703, "bottom": 43.5810609, "right": 3.9282093}
INSIDE = {"lat": 43.6073913, "lon": 3.9109057}  # downtown Montpellier
OUTSIDE = {"lat": 10.0, "lon": 10.0}


class TestGeopointFormats:
    # all 9 accepted formats (convertGeopoint.js:36-127)
    FORMATS = [
        [43.6073913, 3.9109057],
        "43.6073913, 3.9109057",
        "spf8prntv18e",  # geohash
        {"lat": 43.6073913, "lon": 3.9109057},
        {"latLon": [43.6073913, 3.9109057]},
        {"latLon": {"lat": 43.6073913, "lon": 3.9109057}},
        {"latLon": "43.6073913, 3.9109057"},
        {"lat_lon": [43.6073913, 3.9109057]},
        {"latLon": "spf8prntv18e"},
        {"lat_lon": {"lat": 43.6073913, "lon": 3.9109057}},
        {"lat_lon": "43.6073913, 3.9109057"},
        {"lat_lon": "spf8prntv18e"},
    ]

    @pytest.mark.parametrize("fmt", FORMATS)
    def test_accepted(self, fmt):
        pt = convert_geopoint(fmt)
        assert pt is not None
        lat, lon = pt
        assert lat == pytest.approx(43.607, abs=0.05)
        assert lon == pytest.approx(3.91, abs=0.07)

    @pytest.mark.parametrize("bad", [None, 42, [1], [1, 2, 3], {"x": 1}, "nope,", ""])
    def test_rejected(self, bad):
        assert convert_geopoint(bad) is None

    def test_geohash_decode_matches_reference_fixture(self):
        lat, lon = convert_geopoint("spf8prntv18e")
        assert lat == pytest.approx(43.6331979, abs=1e-6)
        assert lon == pytest.approx(3.8433703, abs=1e-6)


class TestDistance:
    @pytest.mark.parametrize(
        "s,meters",
        [
            ("500m", 500.0),
            ("0.5km", 500.0),
            ("1 km", 1000.0),
            ("3 258,55 Ft", 3258.55 * 0.3048),
            ("10", 10.0),
            ("1mi", 1609.344),
        ],
    )
    def test_convert(self, s, meters):
        assert convert_distance(s) == pytest.approx(meters, rel=1e-9)

    def test_invalid(self):
        with pytest.raises(Exception):
            convert_distance("xx yy")


def register_and_test(filt, doc):
    k = Koncorde()
    fid = k.register(filt)
    return fid in k.test(doc)


class TestGeoBoundingBox:
    # the same canonical box in several input formats must match identically
    BOX_FORMATS = [
        BOX,
        {"topLeft": {"lat": BOX["top"], "lon": BOX["left"]},
         "bottomRight": {"lat": BOX["bottom"], "lon": BOX["right"]}},
        {"top_left": {"lat": BOX["top"], "lon": BOX["left"]},
         "bottom_right": {"lat": BOX["bottom"], "lon": BOX["right"]}},
        {k: str(v) for k, v in BOX.items()},  # string numbers
    ]

    @pytest.mark.parametrize("fmt", BOX_FORMATS)
    def test_inside(self, fmt):
        assert register_and_test({"geoBoundingBox": {"pos": fmt}}, {"pos": INSIDE})

    @pytest.mark.parametrize("fmt", BOX_FORMATS)
    def test_outside(self, fmt):
        assert not register_and_test({"geoBoundingBox": {"pos": fmt}}, {"pos": OUTSIDE})

    def test_corner_inclusive(self):
        assert register_and_test(
            {"geoBoundingBox": {"pos": BOX}},
            {"pos": {"lat": BOX["top"], "lon": BOX["left"]}},
        )

    def test_doc_point_formats(self):
        for doc_pt in ["43.6073913, 3.9109057", [43.6073913, 3.9109057], INSIDE]:
            assert register_and_test({"geoBoundingBox": {"pos": BOX}}, {"pos": doc_pt})

    def test_missing_point_no_match(self):
        assert not register_and_test({"geoBoundingBox": {"pos": BOX}}, {})


class TestGeoDistance:
    def test_within(self):
        f = {"geoDistance": {"pos": INSIDE, "distance": "500m"}}
        assert register_and_test(f, {"pos": {"lat": 43.608, "lon": 3.911}})

    def test_beyond(self):
        f = {"geoDistance": {"pos": INSIDE, "distance": "500m"}}
        assert not register_and_test(f, {"pos": {"lat": 43.7, "lon": 3.911}})

    def test_distance_units_equivalent(self):
        k = Koncorde()
        a = k.register({"geoDistance": {"pos": INSIDE, "distance": "500m"}})
        b = k.register({"geoDistance": {"pos": INSIDE, "distance": "0,5 km"}})
        assert a == b  # same canonical meters → same filter ID


class TestGeoDistanceRange:
    F = {"geoDistanceRange": {"pos": INSIDE, "from": "1km", "to": "10km"}}

    def test_in_annulus(self):
        assert register_and_test(self.F, {"pos": {"lat": 43.64, "lon": 3.9109057}})

    def test_too_close(self):
        assert not register_and_test(self.F, {"pos": INSIDE})

    def test_too_far(self):
        assert not register_and_test(self.F, {"pos": {"lat": 44.5, "lon": 3.9109057}})


class TestGeoPolygon:
    # pentagon around central Montpellier (geoPolygon.test.js shape)
    PENTAGON = [
        [43.6021299, 3.8989713],
        [43.6057389, 3.8968173],
        [43.6092889, 3.8970423],
        [43.6100359, 3.9040853],
        [43.6069619, 3.9170343],
    ]

    def test_inside(self):
        f = {"geoPolygon": {"pos": {"points": self.PENTAGON}}}
        assert register_and_test(f, {"pos": {"lat": 43.607, "lon": 3.905}})

    def test_outside(self):
        f = {"geoPolygon": {"pos": {"points": self.PENTAGON}}}
        assert not register_and_test(f, {"pos": OUTSIDE})

    def test_vertex_geohash_formats(self):
        f = {"geoPolygon": {"pos": {"points": [
            "spfb09x0ud5s", [43.6057389, 3.8968173], {"lat": 43.6092889, "lon": 3.8970423},
            "43.6100359, 3.9040853", {"latLon": [43.6069619, 3.9170343]},
        ]}}}
        assert register_and_test(f, {"pos": {"lat": 43.607, "lon": 3.905}})


class TestNotGeospatial:
    def test_not_bbox(self):
        f = {"not": {"geoBoundingBox": {"pos": BOX}}}
        assert register_and_test(f, {"pos": OUTSIDE})
        assert not register_and_test(f, {"pos": INSIDE})

    def test_missing_point_matches(self):
        f = {"not": {"geoDistance": {"pos": INSIDE, "distance": "500m"}}}
        assert register_and_test(f, {})
        assert register_and_test(f, {"pos": "garbage"})

    def test_multiple_shapes_complement(self):
        k = Koncorde()
        near = k.register({"geoDistance": {"pos": INSIDE, "distance": "100km"}})
        notnear = k.register({"not": {"geoDistance": {"pos": INSIDE, "distance": "100km"}}})
        got_in = set(k.test({"pos": INSIDE}))
        got_out = set(k.test({"pos": OUTSIDE}))
        assert got_in == {near}
        assert got_out == {notnear}


class TestShapeFormatMatrix:
    """Montpellier matrix: every geo shape keyword registered with every
    accepted point format must match the same inside doc and reject the
    same outside doc (the reference exercises this per-shape across
    geo*.test.js; here it's one parametrized grid)."""

    POINT_FORMATS = TestGeopointFormats.FORMATS

    @pytest.mark.parametrize("fmt", POINT_FORMATS)
    def test_geodistance_center_formats(self, fmt):
        f = {"geoDistance": {"pos": fmt, "distance": "10km"}}
        assert register_and_test(f, {"pos": INSIDE})
        assert not register_and_test(f, {"pos": OUTSIDE})

    @pytest.mark.parametrize("fmt", POINT_FORMATS)
    def test_geodistancerange_center_formats(self, fmt):
        f = {"geoDistanceRange": {"pos": fmt, "from": "1m", "to": "10km"}}
        assert register_and_test(f, {"pos": {"lat": 43.62, "lon": 3.92}})
        assert not register_and_test(f, {"pos": OUTSIDE})

    @pytest.mark.parametrize("fmt", POINT_FORMATS)
    def test_doc_point_formats_against_bbox(self, fmt):
        f = {"geoBoundingBox": {"pos": BOX}}
        assert register_and_test(f, {"pos": fmt})

    @pytest.mark.parametrize("fmt", POINT_FORMATS)
    def test_polygon_vertex_formats(self, fmt):
        f = {"geoPolygon": {"pos": {"points": [
            fmt, [43.5810609, 3.8433703], [43.5810609, 3.9282093],
        ]}}}
        # near the triangle base: inside regardless of whether the fmt
        # vertex decodes to the exact point or the geohash cell center
        assert register_and_test(f, {"pos": {"lat": 43.585, "lon": 3.886}})
        assert not register_and_test(f, {"pos": OUTSIDE})


class TestInvalidGeohashChars:
    """Deliberate divergence (documented in SURVEY.md): geohashes with
    non-base32 chars a/i/l/o are rejected loudly — the reference's
    ngeohash silently decodes them to garbage coordinates near (90,180)
    (indexOf -1 & bit is truthy -> always upper half-interval)."""

    def test_invalid_base32_rejected(self):
        import pytest as _pytest

        from koncorde_spark import Koncorde
        from koncorde_spark.errors import KoncordeParseError

        k = Koncorde()
        for gh in ["solo", "abcd", "airy"]:
            with _pytest.raises(KoncordeParseError):
                k.register({"geoDistance": {"pt": gh, "distance": "1km"}})

    def test_valid_base32_accepted(self):
        from koncorde_spark import Koncorde

        assert Koncorde().register(
            {"geoDistance": {"pt": "spey61", "distance": "1km"}}
        )
