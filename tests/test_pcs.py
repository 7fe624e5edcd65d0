"""PCS auto-selection — port of the reference's tests/test_pcs.py over
the synthesized region table (the reference's EPSG region file is
missing from its repo; entries our table defines match the reference's
exact golden EPSG codes, others are own goldens and documented)."""

import pytest

from mundipy_spark.pcs import (
    NoProjectionFoundError,
    choose_pcs,
    suggest_pcs,
    unit_scale,
)


def test_choose_pcs_utm():
    # reference test_choose_pcs_bench golden (exact match)
    assert choose_pcs((-118.843683, 34.052235, -118.143683, 34.552235)) == {
        "name": "WGS 84 / UTM zone 11N",
        "epsg": 32611,
        "crs": "EPSG:32611",
        "units": "meters",
    }


def test_choose_pcs_feet_regional():
    # reference golden: NH feet query -> EPSG:3445 (exact match)
    assert choose_pcs((-71.857247, 44.19699, -71.610621, 44.305476), units="feet") == {
        "name": "NAD83(HARN) / New Hampshire (ftUS)",
        "epsg": 3445,
        "crs": "EPSG:3445",
        "units": "feet",
    }
    # Texas feet (own golden — the reference fixture plays this role)
    got = choose_pcs((-98.0, 30.0, -97.5, 30.5), units="feet")
    assert got["epsg"] == 2277 and got["units"] == "feet"


def test_choose_pcs_netherlands_regional():
    # reference returns EPSG:5643 here; our synthesized table resolves
    # the smaller national grid (own golden, same algorithm shape)
    got = choose_pcs((3.31497114423, 50.803721015, 7.09205325687, 53.5104033474))
    assert got["epsg"] == 28992 and got["units"] == "meters"


def test_no_pcs_feet_global():
    # reference test_no_pcs (exact behavior match)
    with pytest.raises(NoProjectionFoundError):
        choose_pcs((-36.123047, 50.930738, -31.135254, 53.186288), units="feet")


def test_global_pcs_mollweide():
    # reference test_global_pcs (exact match incl. no epsg key): the
    # bbox straddles a UTM zone boundary, so no region contains it
    assert choose_pcs((-36.123047, 50.930738, -31.135254, 53.186288), units="meters") == {
        "name": "World Mollweide",
        "crs": "ESRI:54009",
        "units": "meters",
    }


def test_suggest_pcs_ranked():
    # Netherlands: national grid, then the containing UTM zone, then world
    got = suggest_pcs((4.0, 51.0, 5.9, 53.0), n=3)
    assert [g.get("epsg") for g in got[:2]] == [28992, 32631]
    assert got[2]["crs"] == "ESRI:54009"
    # feet never silently falls back to a meters CRS
    ft = suggest_pcs((-71.8, 44.2, -71.6, 44.3), units="feet", n=3)
    assert ft and all(g["units"] == "feet" for g in ft)


def test_unit_scale():
    assert unit_scale("meters") == 1.0
    assert abs(unit_scale("feet") - 3.28083333) < 1e-6
    with pytest.raises(TypeError):
        unit_scale("furlongs")
