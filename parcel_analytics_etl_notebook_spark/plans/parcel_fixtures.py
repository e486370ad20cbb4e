"""Synthetic parcel-event fixture generator (FIXTURES.md §A shapes):
builds the reference's raw input — a quoted multiline CSV whose `event`
column holds the nested JSON payload — without any private data.

Used by the `etl` CLI demo and the pipeline tests; event mix covers the
cases the reference's data exhibits: full lifecycles, missing legs,
duplicate shipping_ids, null keys, malformed JSON, embedded
newlines/quotes.
"""

from __future__ import annotations

import csv
import json
import random


def event_json(
    code: str,
    sub: str | None,
    event_date: str,
    shipping_id: str | None,
    brand: str | None = "BR",
    sign: str | None = "SG",
    coll: tuple[int, str] = (1, "FR"),
    deliv: tuple[int, str] = (2, "FR"),
    state: tuple[str, str, str, str] = ("ST", "2024-01-01", "N", "S1"),
    indent: int | None = None,
) -> str:
    """One event payload in the reference's schema (etl/main.py:86-125).

    ``indent`` pretty-prints the JSON — literal newlines inside the CSV
    cell, which is exactly why the reference reads with multiLine=True
    (its payloads were pretty-printed)."""
    return json.dumps(
        {
            "event_code": code,
            "event_date": event_date,
            "entry_date": event_date,
            "event_nature": "nature",
            "event_sub_code": sub,
            "shipping": {
                "sign_code": sign,
                "brand_code_alpha": brand,
                "collection": {
                    "prestation_code": "P1",
                    "round": {"codeAgence": coll[0], "pays": coll[1]},
                },
                "paid": "Y",
                "sav_folder": False,
                "is_replaced": False,
                "state": {
                    "code": state[0],
                    "date": state[1],
                    "nature": state[2],
                    "sousCode": state[3],
                },
                "canceled_state": None,
                "shipping_id": shipping_id,
                "delivery": {
                    "prestation_code": "P2",
                    "round": {"codeAgence": deliv[0], "pays": deliv[1]},
                },
                "parcel_number": 1,
                "shipping_number": 10,
                "options": None,
                "parcel_sequence": 1,
            },
        },
        indent=indent,
    )


def write_fixture_csv(path: str, n_shipments: int = 200, seed: int = 7) -> int:
    """Write a parcel-events CSV; returns the row count. Deterministic
    for a given seed. ~5% of shipments miss a lifecycle leg, plus the
    edge rows (null keys, malformed JSON, embedded newlines/quotes)."""
    rng = random.Random(seed)
    countries = ["FR", "DE", "ES"]
    rows: list[str] = []
    for i in range(n_shipments):
        sid = f"SHIP{i:05d}"
        coll = (rng.randint(1, 9), rng.choice(countries))
        deliv = (rng.randint(10, 19), rng.choice(countries))
        day0 = rng.randint(1, 20)
        sent = f"2024-01-{day0:02d} 08:00:00"
        delivered = f"2024-01-{min(day0 + rng.randint(1, 4), 28):02d} 10:00:00"
        picked = f"2024-01-{min(day0 + rng.randint(2, 6), 28):02d} 12:00:00"
        rows.append(event_json("PEC", rng.choice(["REL", "APM"]), sent, sid, coll=coll, deliv=deliv,
                               indent=2 if i % 20 == 0 else None))
        if rng.random() > 0.05:
            rows.append(event_json("TRN", rng.choice(["REL", "APM"]), delivered, sid, coll=coll, deliv=deliv))
        if rng.random() > 0.05:
            rows.append(event_json("LIV", None, picked, sid, coll=coll, deliv=deliv))
    # edge rows the reference's DQ/parse path must tolerate
    rows.append(event_json("PEC", "REL", "2024-01-21 09:00:00", None))
    rows.append(event_json("PEC", "REL", "2024-01-21 10:00:00", "SHIPNULL", brand=None, sign=None))
    rows.append(event_json("TRN", "REL", "2024-01-21 11:00:00", 'SHIP"Q\nX'))
    rows.append("{this is not valid json")

    with open(path, "w", newline="") as fh:
        w = csv.writer(fh, quoting=csv.QUOTE_ALL, doublequote=True)
        w.writerow(["row_id", "event"])
        for i, ev in enumerate(rows):
            w.writerow([str(i), ev])
    return len(rows)
