import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from atlassian_sampling_processor_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="asp-tests", cores=4, shuffle_partitions=4)
    yield s


def hex_trace(trace_hex: str) -> tuple[int, int]:
    """32-hex trace id → signed (hi, lo) int64 pair."""
    trace_hex = trace_hex.replace(" ", "")
    assert len(trace_hex) == 32
    hi = int(trace_hex[:16], 16)
    lo = int(trace_hex[16:], 16)

    def s64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    return s64(hi), s64(lo)


def merged_row(**over):
    """One row of the merged per-trace aggregate with sane defaults."""
    base = dict(
        doc_id="0" * 32,
        trace_hi=0,
        trace_lo=0,
        batch_span_count=1,
        total_span_count=1,
        merged_min_start=0,
        merged_max_end=0,
        any_status_unset=False,
        any_status_ok=False,
        any_status_error=False,
        min_threshold=None,
        any_root=False,
        merged_priority=2,
        last_low_policy=None,
        first_source="svc",
        cached_priority=None,
        batch_idx=0,
    )
    base.update(over)
    return base


MERGED_SCHEMA = (
    "doc_id string, trace_hi long, trace_lo long, batch_span_count int,"
    " total_span_count int, merged_min_start long, merged_max_end long,"
    " any_status_unset boolean, any_status_ok boolean, any_status_error boolean,"
    " min_threshold long, any_root boolean, merged_priority int,"
    " last_low_policy string, first_source string, cached_priority int, batch_idx int"
)


def merged_df(spark, rows):
    return spark.createDataFrame([merged_row(**r) for r in rows], schema=MERGED_SCHEMA)
