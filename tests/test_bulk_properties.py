"""Property tests for the bulk pre-enqueue contract (round 12).

Two directions matter:
  - arbitrary bytes must NEVER crash the validator with anything but
    BulkValidationError (a request-path crash drops the connection);
  - anything the SYNC decoder accepts must pass validation (a false
    400 would be a parity break — the validator is only allowed to be
    MORE permissive than the decoder, never less).
Plus the pyroscope metadata frame roundtrip.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from gigapipe_spark.bulk import (
    BulkValidationError,
    KINDS,
    frame_profile,
    _unframe_profile,
    validate,
)


@settings(max_examples=300, deadline=None)
@given(kind=st.sampled_from(sorted(KINDS)), payload=st.binary(max_size=512))
def test_validate_total_on_arbitrary_bytes(kind, payload):
    try:
        validate(kind, payload)
    except BulkValidationError:
        pass  # the only permitted failure mode


_label = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters='"\\\x00', max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=100, deadline=None)
@given(app=_label, line=_label, ts=st.integers(10**18, 2 * 10**18))
def test_valid_loki_push_always_passes(app, line, ts):
    body = json.dumps(
        {"streams": [{"stream": {"app": app}, "values": [[str(ts), line]]}]}
    ).encode()
    validate("loki_json", body)  # must not raise


@settings(max_examples=100, deadline=None)
@given(
    meas=st.text(alphabet="abcdefgh", min_size=1, max_size=8),
    field=st.text(alphabet="xyz", min_size=1, max_size=6),
    val=st.floats(allow_nan=False, allow_infinity=False, width=32),
    ts=st.integers(10**18, 2 * 10**18),
)
def test_valid_influx_line_always_passes(meas, field, val, ts):
    validate("influx", f"{meas} {field}={val} {ts}".encode())


@settings(max_examples=150, deadline=None)
@given(
    service=_label,
    spy=_label,
    start=st.integers(0, 2**62),
    end=st.integers(0, 2**62),
    tags=st.dictionaries(_label, _label, max_size=4),
    body=st.binary(max_size=256),
)
def test_profile_frame_roundtrip(service, spy, start, end, tags, body):
    meta = {"service": service, "tags": tags, "start": start, "end": end,
            "spy": spy}
    m2, b2 = _unframe_profile(frame_profile(meta, body))
    assert m2 == meta
    assert b2 == body
