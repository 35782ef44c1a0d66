"""Property-based tests (hypothesis) for the pure-function seams:
codec roundtrips and arithmetic invariants that unit fixtures only
spot-check."""

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from mod_reservoir_spark.operators.export import (
    decode_resumption_token,
    encode_resumption_token,
)
from mod_reservoir_spark.pipeline.multimodal import fit_dims

ids = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=127),
    min_size=1,
    max_size=20,
)
stamps = st.datetimes(
    min_value=datetime(1990, 1, 1), max_value=datetime(2100, 1, 1)
)


@settings(max_examples=200, deadline=None)
@given(from_dt=stamps, rec_id=ids, until_dt=st.none() | stamps,
       set_id=st.none() | ids, space_sep=st.booleans())
def test_resumption_token_roundtrip(from_dt, rec_id, until_dt, set_id,
                                    space_sep):
    """Any (from, id, until?, set?) combination survives the codec —
    including timestamps rendered with a space separator (the round-1
    corruption shape flagged in ADVICE)."""
    sep = " " if space_sep else "T"
    from_ts = from_dt.isoformat(sep=sep)
    until = until_dt.isoformat(sep=sep) if until_dt else None
    tok = encode_resumption_token(from_ts, rec_id, until=until,
                                  set_id=set_id)
    out = decode_resumption_token(tok)
    assert out["from"] == from_ts.replace(" ", "T")
    assert out["id"] == rec_id
    assert out["until"] == (until.replace(" ", "T") if until else None)
    assert out["set"] == set_id


dims = st.integers(min_value=1, max_value=100_000)


@settings(max_examples=500, deadline=None)
@given(w=dims, h=dims, mw=dims, mh=dims)
def test_fit_dims_invariants(w, h, mw, mh):
    ow, oh = fit_dims(w, h, mw, mh)
    assert 1 <= ow <= max(mw, 0) or (w <= mw and ow == w)
    assert ow <= mw and oh <= mh          # fits the box
    assert ow <= w and oh <= h            # never upscales
    if (w, h) != (ow, oh):                # scaled: exact floor of ratio
        if w * mh >= h * mw:
            assert ow == mw and oh == max(1, h * mw // w)
        else:
            assert oh == mh and ow == max(1, w * mh // h)
    # idempotence: fitting the result again is a no-op
    assert fit_dims(ow, oh, mw, mh) == (ow, oh)


@settings(max_examples=200, deadline=None)
@given(
    field=st.sampled_from(["localId", "sourceId", "id"]),
    value=st.text(
        alphabet=st.characters(whitelist_categories=("N",)),
        min_size=1, max_size=6,
    ),
)
def test_cql_id_fields_compare_as_text(field, value):
    """Numeric-looking literals on id-like fields stay strings in the
    generated SQL (ADVICE: 'localId = 0001' must not become int 1)."""
    from mod_reservoir_spark.operators.clusters import RECORD_FIELDS
    from mod_reservoir_spark.plans.cql import parse_cql

    sql = parse_cql(f"{field} = {value}").to_sql(RECORD_FIELDS)
    assert f"'{value}'" in sql
