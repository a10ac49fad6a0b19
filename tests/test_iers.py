"""IERS earth-orientation store (VERDICT r4 missing #7; ref
src-core/db/iers/iers_handler.cpp)."""

import numpy as np

from satdump_tpu.geo.iers import (IERSInfo, IERSStore, eci_to_ecef_iers,
                                  gmst_ut1, parse_finals2000a,
                                  parse_iers_json, parse_leap_seconds,
                                  polar_motion_matrix)

# two real-format finals2000A.all lines (MJD 60310/60311)
FINALS = (
    "24 1 1 60310.00 I  0.231456 0.000031  0.189432 0.000042  I"
    " 0.0123456 0.0000123  1.2345 0.0123  I   0.123    0.123    0.345"
    "    0.345\n"
    "24 1 2 60311.00 I  0.232001 0.000031  0.188990 0.000042  I"
    " 0.0125000 0.0000123  1.2345 0.0123  I   0.123    0.123    0.345"
    "    0.345\n")

LEAPS = """#
# NTP leap seconds list excerpt
2272060800	10	# 1 Jan 1972
3692217600	37	# 1 Jan 2017
"""

IERS_JSON = """{
 "EOP": {"data": {"timeSeries": [
  {"time": {"MJD": "60310"},
   "dataEOP": {"pole": [{"source": "BulletinA", "X": "0.231456",
                         "Y": "0.189432"}],
               "UT": [{"UT1-UTC": "0.0123456"}]}},
  {"time": {"MJD": "60312"},
   "dataEOP": {"pole": [{"source": "BulletinB", "X": "9", "Y": "9"}],
               "UT": [{"UT1-UTC": "9"}]}}
 ]}}}"""


def test_parse_finals2000a():
    eop = parse_finals2000a(FINALS)
    assert len(eop) == 2
    assert eop[0].time == (60310.0 - 40587.0) * 86400.0
    assert eop[0].pole_x == 0.231456
    assert eop[0].pole_y == 0.189432
    assert eop[0].ut1_utc == 0.0123456


def test_parse_json_bulletin_a_only():
    eop = parse_iers_json(IERS_JSON)
    assert len(eop) == 1                 # BulletinB entry skipped
    assert eop[0].pole_x == 0.231456


def test_parse_leap_seconds():
    ls = parse_leap_seconds(LEAPS)
    assert ls[2272060800 - 2208988800] == 10
    assert ls[3692217600 - 2208988800] == 37


def test_store_roundtrip_and_query(tmp_path):
    st = IERSStore(str(tmp_path / "iers.json"))
    assert st.update_from_text(FINALS) == 2
    assert st.update_from_text(LEAPS) == 2
    t = (60310.5 - 40587.0) * 86400.0    # mid-day: nearest preceding entry
    info = st.get(t)
    assert info.pole_x == 0.231456
    assert info.ut1_utc == 0.0123456
    assert info.leap_seconds == 37
    # reload from disk
    st2 = IERSStore(str(tmp_path / "iers.json"))
    info2 = st2.get(t)
    assert info2.pole_x == info.pole_x and info2.leap_seconds == 37


def test_polar_motion_and_ut1():
    info = IERSInfo(0.0, 0.2, 0.3, 0.5, 37)
    W = polar_motion_matrix(info)
    # orthonormal to first order; off-diagonals are the arcsec angles
    assert abs(W[0, 2] - 0.2 * np.pi / 648000) < 1e-12
    assert abs(W[1, 2] + 0.3 * np.pi / 648000) < 1e-12
    np.testing.assert_allclose(W @ W.T, np.eye(3), atol=1e-11)

    # dUT1 shifts sidereal time by the earth-rotation rate
    t = 1_700_000_000.0
    dth = float(gmst_ut1(t, info) - gmst_ut1(t, None))
    expect = 0.5 * 2 * np.pi * 1.0027379 / 86400.0
    assert abs(dth - expect) < 5e-9

    # ECI->ECEF with EOP differs from the plain rotation by ~dUT1 x R
    r = np.array([7000.0, 0.0, 0.0])
    a = eci_to_ecef_iers(r, t, info)
    b = eci_to_ecef_iers(r, t, None)
    d = np.linalg.norm(a - b)
    assert 0.2 < d < 0.6                 # ~0.36 km for dUT1=0.5 s


def test_auto_update_scheduling(monkeypatch, tmp_path):
    """The store schedules through the framework task scheduler exactly
    like the TLE DB (iers_handler.cpp:45-53)."""
    from satdump_tpu.core.tasks import task_scheduler
    from satdump_tpu.geo import iers as iers_mod

    st = IERSStore(str(tmp_path / "iers.json"))
    fetched = []

    def fake_update(url):
        fetched.append(url)
        return st.update_from_text(FINALS)

    monkeypatch.setattr(st, "update_from_url", fake_update)
    iers_mod.schedule_auto_update(st, interval_s=1e-3, urls=("u1", "u2"))
    fired = task_scheduler.tick(now=1e12)
    task_scheduler.del_task("auto_iers_update")
    assert "auto_iers_update" in fired
    assert fetched == ["u1", "u2"]
    assert st.get(1.7e9) is not None


def test_nutation_iau2000b():
    """Truncated IAU 2000B nutation: magnitudes and sign behavior match
    the known series (dPsi ~ -17"..+17", dominated by the 18.6-year Om
    term; dEps ~ ±9.2")."""
    from satdump_tpu.geo.iers import (gast, gmst_ut1, mean_obliquity,
                                      nutation_iau2000b)
    t = np.array([0.0, 0.5e9, 1.0e9, 1.7e9])
    dpsi, deps = nutation_iau2000b(t)
    arcsec = np.pi / 648000
    assert np.all(np.abs(dpsi) < 20 * arcsec)
    assert np.all(np.abs(deps) < 11 * arcsec)
    assert np.any(np.abs(dpsi) > 2 * arcsec)   # not trivially zero
    # obliquity ~ 23.43 deg
    eps = mean_obliquity(1.7e9)
    assert abs(np.degrees(eps) - 23.436) < 0.01
    # GAST - GMST = equation of equinoxes = dPsi cos(eps), < 1.2"
    d = float(gast(1.7e9) - gmst_ut1(1.7e9, None))
    assert abs(d) < 1.2 * 15 * arcsec
    assert abs(d - float(dpsi[3] * np.cos(eps))) < 1e-12
