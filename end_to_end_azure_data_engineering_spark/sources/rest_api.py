"""REST API source — S8 (reference: 3_api_extracts/api_fx_rates.py).

The reference pulls ECB EXR csvdata with requests + pandas, keeps the
latest observation per currency, and lands parquet. Latent bug reproduced
as a fix: its `currencies`/`freq` are used but never read from widgets
(api_fx_rates.py:19-21,45-46 — NameError as written); here they are real
parameters (SURVEY §7.3).

The HTTP fetch is injectable so tests (and this offline container) run
against canned CSV; on a cluster pass a requests-backed fetcher.
"""

from __future__ import annotations

import datetime as _dt
import io
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

ECB_URL_TEMPLATE = (
    "https://data-api.ecb.europa.eu/service/data/EXR/"
    "{freq}.{currencies}.EUR.SP00.A?format=csvdata&lastNObservations=1"
)

CURRENCY_NAMES = {
    "USD": "US Dollar", "JPY": "Japanese Yen", "GBP": "Pound Sterling",
    "CHF": "Swiss Franc",
}


def fetch_fx_rates(
    spark: SparkSession,
    fetcher: Callable[[str], str],
    currencies: tuple[str, ...] = ("USD", "JPY", "GBP", "CHF"),
    freq: str = "M",
    as_of: _dt.datetime | None = None,
) -> DataFrame:
    """GET the EXR series → latest obs per currency → conformed DataFrame.

    fetcher(url) -> csv text (ECB csvdata layout: CURRENCY, TIME_PERIOD,
    OBS_VALUE, TITLE columns). Driver-side pandas munging mirrors the
    reference (api_fx_rates.py:55-77); the result is a tiny dim (≤ dozens
    of rows), so createDataFrame is the right boundary — not a UDF job.
    """
    url = ECB_URL_TEMPLATE.format(freq=freq, currencies="+".join(currencies))
    csv_text = fetcher(url)
    pdf = pd.read_csv(io.StringIO(csv_text))

    pdf = pdf.rename(
        columns={c: c.upper() for c in pdf.columns}
    )[["CURRENCY", "TIME_PERIOD", "OBS_VALUE"]]
    # latest observation per currency (api_fx_rates.py:64-67)
    pdf = (
        pdf.sort_values(["CURRENCY", "TIME_PERIOD"])
        .groupby("CURRENCY", as_index=False)
        .tail(1)
    )
    as_of = as_of or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    out = pd.DataFrame(
        {
            "base_currency": "EUR",
            "currency_code": pdf["CURRENCY"].astype(str),
            "currency_name": pdf["CURRENCY"].map(CURRENCY_NAMES).fillna(pdf["CURRENCY"]),
            "rate": pdf["OBS_VALUE"].astype(float),
            # monthly periods ("2024-01") normalize to first-of-month
            "obs_date": pd.to_datetime(
                pdf["TIME_PERIOD"].astype(str).map(lambda s: s if len(s) >= 10 else s + "-01"),
                errors="coerce",
            ).dt.date,
            "as_of": as_of,
        }
    )
    return spark.createDataFrame(out)
