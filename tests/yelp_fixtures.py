"""Deterministic yelp-domain fixture generator (FIXTURES.md §A).

Synthesizes ``results.ndjson``-shaped records covering every hour-string
case the reference handles (parse_and_upload_to_db.py:58-81), constraint
violations for the quarantine path, and nulls — all seeded.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

WEEKDAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]

HOUR_STRINGS = [
    "11:00 AM - 3:00 PM",
    "11:00 AM - 3:00 PM4:30 PM - 10:00 PM",  # split shift → 2 rows
    "Closed",
    "Open 24 hours",
    "5:00 PM - 1:00 AM (Next day)",  # overnight
    "9:00 PM - 2:00 AM (Next day)",  # overnight
    "11 AM - 9 PM",  # hour-only (reference regex rejects; we accept)
    "8:30 AM - 11:45 PM",
]

CATEGORIES = ["Thai", "Pizza", "Sushi", "Burgers", "Vegan", "Ramen", "Tacos", "BBQ"]
TERMS = ["lunch", "dinner", "takeout", "delivery", "date night", "cheap eats"]
HIGHLIGHTS = ["outdoor seating", "wifi", "family friendly", "live music", "pet friendly"]
AMENITIES = ["parking", "wheelchair access", "wifi", "delivery", "reservations"]
PRICES = ["$", "$$", "$$$", "$$$$"]
BAD_PRICES = ["$$$$$", "free", ""]
BAD_HEALTH = ["AA", "a", "9"]


def make_results(n: int, seed: int = 42, bad_fraction: float = 0.06) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        biz = {
            "bizId": f"biz-{i:05d}",
            "ranking": i + 1,
            "name": f"Restaurant {i:04d}",
            "website": None if rng.random() < 0.2 else f"https://r{i}.example.com",
            "phone_number": None if rng.random() < 0.1 else f"({rng.randint(200,999)}) 555-{rng.randint(1000,9999)}",
            "address": None if rng.random() < 0.1 else f"{rng.randint(1,999)} Main St",
            "price": rng.choice(PRICES) if rng.random() < 0.8 else None,
            "health_score": rng.choice("ABC") if rng.random() < 0.7 else None,
            "open_hours": [
                {"weekday": d, "open_hours": rng.choice(HOUR_STRINGS)}
                for d in WEEKDAYS
                if rng.random() < 0.85
            ],
            "food_category": rng.sample(CATEGORIES, rng.randint(0, 3)),
            "amenities": [
                {"amenity": a, "is_available": rng.random() < 0.7}
                for a in rng.sample(AMENITIES, rng.randint(0, 3))
            ],
            "highlights": rng.sample(HIGHLIGHTS, rng.randint(0, 2)),
            "related_search_terms": rng.sample(TERMS, rng.randint(0, 3)),
        }
        # Constraint violations → quarantine (P11).
        if rng.random() < bad_fraction:
            if rng.random() < 0.5:
                biz["price"] = rng.choice(BAD_PRICES)
            else:
                biz["health_score"] = rng.choice(BAD_HEALTH)
        # Occasional unparseable hour string → hours_rejects.
        if rng.random() < 0.04 and biz["open_hours"]:
            biz["open_hours"][0] = {"weekday": biz["open_hours"][0]["weekday"], "open_hours": "see website"}
        rows.append(biz)
    return rows


def write_ndjson(rows: list[dict], path: Path) -> Path:
    with path.open("w") as f:
        for r in rows:
            json.dump(r, f)
            f.write("\n")
    return path
