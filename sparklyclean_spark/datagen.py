"""Deterministic Febrl-shaped people fixture (FIXTURES.md §1).

Originals + duplicates with seeded field corruptions; ground truth in
the id (``rec-<N>-org`` / ``rec-<N>-dup-<M>``), duplicate iff the
``<N>`` matches — same shape as the reference's data
(``/root/reference/README.md:163-180``). Ids are comma-free (G8).
"""

from __future__ import annotations

import random

COLUMNS = [
    "rec_id", "given_name", "surname", "street_number", "address_1",
    "address_2", "suburb", "postcode", "state", "date_of_birth", "age",
    "phone_number", "soc_sec_id", "blocking_number",
]

_GIVEN = ["amelia", "oliver", "jack", "charlotte", "noah", "ava", "liam",
          "mia", "lucas", "zoe", "ethan", "ruby", "leo", "isla", "max"]
_SUR = ["smith", "jones", "brown", "wilson", "taylor", "lee", "martin",
        "white", "walker", "young", "king", "hall", "green", "baker"]
_STREETS = ["george st", "king st", "queen st", "elizabeth st", "park rd",
            "station rd", "high st", "church st", "beach rd", "mill ln"]
_SUBURBS = ["newtown", "richmond", "brunswick", "parkside", "seaview",
            "hillcrest", "riverside", "lakeside", "fairfield", "oakleigh"]
# nsw heavily skewed (~29%) like the reference data (FIXTURES.md).
_STATES = ["nsw"] * 29 + ["vic"] * 20 + ["qld"] * 15 + ["wa"] * 10 + \
          ["sa"] * 8 + ["tas"] * 5 + ["act"] * 4 + ["nt"] * 3 + [""] * 6


def _corrupt(rng: random.Random, s: str) -> str:
    if not s:
        return s
    op = rng.choice(["sub", "del", "ins", "swap"])
    i = rng.randrange(len(s))
    c = rng.choice("abcdefghijklmnopqrstuvwxyz")
    if op == "sub":
        return s[:i] + c + s[i + 1:]
    if op == "del":
        return s[:i] + s[i + 1:]
    if op == "ins":
        return s[:i] + c + s[i:]
    if i + 1 < len(s):
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    return s


def make_people(n_originals: int = 200, max_dups: int = 3, seed: int = 42):
    """Rows as tuples matching COLUMNS. ~n_originals*(1+max_dups/2) rows."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_originals):
        rec = {
            "given_name": rng.choice(_GIVEN),
            "surname": rng.choice(_SUR),
            "street_number": rng.randrange(1, 300) if rng.random() > 0.05 else None,
            "address_1": rng.choice(_STREETS),
            "address_2": rng.choice(["", "unit %d" % rng.randrange(1, 20)]),
            "suburb": rng.choice(_SUBURBS),
            "postcode": "%04d" % rng.randrange(2000, 7000),
            "state": rng.choice(_STATES),
            "date_of_birth": int("19%02d%02d%02d" % (rng.randrange(30, 99),
                                                     rng.randrange(1, 13),
                                                     rng.randrange(1, 29)))
            if rng.random() > 0.08 else None,
            "age": rng.randrange(18, 95) if rng.random() > 0.08 else None,
            "phone_number": "0%d %04d %04d" % (rng.randrange(2, 9),
                                               rng.randrange(10000) % 10000,
                                               rng.randrange(10000) % 10000),
            "soc_sec_id": rng.randrange(10**6, 10**7),
            "blocking_number": rng.randrange(10),
        }
        rows.append(("rec-%d-org" % i, *[rec[c] for c in COLUMNS[1:]]))
        for d in range(rng.choices(range(max_dups + 1), weights=[50, 30, 15, 5])[0]):
            dup = dict(rec)
            for _ in range(rng.randrange(1, 4)):
                fld = rng.choice(["given_name", "surname", "address_1", "suburb",
                                  "postcode", "phone_number", "state"])
                dup[fld] = _corrupt(rng, str(dup[fld]))
            rows.append(("rec-%d-dup-%d" % (i, d), *[dup[c] for c in COLUMNS[1:]]))
    return rows


PEOPLE_SCHEMA = (
    "rec_id string, given_name string, surname string, street_number int, "
    "address_1 string, address_2 string, suburb string, postcode string, "
    "state string, date_of_birth bigint, age int, phone_number string, "
    "soc_sec_id bigint, blocking_number int"
)


def people_df(spark, n_originals: int = 200, seed: int = 42):
    return spark.createDataFrame(make_people(n_originals, seed=seed), schema=PEOPLE_SCHEMA)
