"""One-off builder for tests/datasets/restaurants_golden.csv — the
external golden evaluation corpus (VERDICT r02 #7).

Schema-faithful to the reference's restaurant datasets
(dedupe/tests/datasets/restaurant-1.csv: name, address, city, cuisine,
unique_id) but hand-authored here: the base entities and every
variation rule below were written for this fixture and share nothing
with synth.synth_pages' mutation model (word-level swap/dup/drop over
entity word pools). The CSV is generated once by this script and
FROZEN into the repo; tests read only the CSV.

Variation rules (second/third source renderings of the same entity):
- address: street-suffix abbreviation (street -> st. etc), optional
  period drop, "suite" -> "ste"
- name: apostrophe drop, "the " prefix toggle, "&" <-> "and",
  deterministic adjacent-char transposition in one word (1 in 3)
- city: alias table (new york <-> nyc, los angeles <-> la, ...)
- cuisine: synonym table (barbecue <-> bbq, ...)

Precision traps: entities sharing a name stem in different cities, and
same-street different-number neighbors.
"""

from __future__ import annotations

import csv
import pathlib

STEMS = [
    "golden dragon", "blue plate", "casa verde", "the rusty anchor",
    "mama rosa's", "king noodle", "harbor lights", "el toro loco",
    "sakura garden", "the copper kettle", "bombay palace", "lucky star",
    "green olive", "smoke & barrel", "the daily grind", "villa toscana",
    "red lantern", "pearl of the sea", "uncle joe's", "the tin roof",
    "saffron house", "black sheep bistro", "la petite maison",
    "iron skillet", "the velvet fig", "old mill tavern", "sunrise diner",
    "the whistling pig", "cedar & sage", "port of call",
]
QUALIFIERS = [
    "", " grill", " kitchen", " cafe", " express", " house", " bar",
    " tavern", " cantina", " eatery", " room",
]
STREETS = [
    "ventura boulevard", "la cienega boulevard", "stone canyon road",
    "melrose avenue", "ocean park drive", "beverly glen street",
    "canon drive", "pico boulevard", "wilshire boulevard",
    "sepulveda street", "mulholland drive", "figueroa street",
    "colorado avenue", "national road", "jefferson boulevard",
    "lincoln avenue", "arizona street", "montana avenue",
    "broadway street", "spring road",
]
CITIES = [
    "los angeles", "new york", "san francisco", "studio city",
    "sherman oaks", "bel air", "santa monica", "pasadena", "brooklyn",
    "chicago", "west hollywood", "venice",
]
CITY_ALIAS = {
    "los angeles": "la",
    "new york": "nyc",
    "san francisco": "sf",
    "west hollywood": "weho",
}
CUISINES = [
    "steakhouses", "delis", "californian", "french bistro", "chinese",
    "italian", "barbecue", "seafood", "mexican", "japanese", "indian",
    "american (new)", "coffee shops", "thai", "mediterranean",
]
CUISINE_SYN = {
    "barbecue": "bbq",
    "american (new)": "new american",
    "coffee shops": "coffeehouse",
    "french bistro": "bistro",
}
SUFFIX_ABBREV = {
    "boulevard": "blvd.",
    "avenue": "ave.",
    "street": "st.",
    "road": "rd.",
    "drive": "dr.",
}


def _transpose_word(name: str, k: int) -> str:
    """Deterministic adjacent-char swap inside the longest word."""
    words = name.split()
    wi = max(range(len(words)), key=lambda i: len(words[i]))
    w = words[wi]
    if len(w) < 4:
        return name
    p = 1 + (k % (len(w) - 2))
    words[wi] = w[:p] + w[p + 1] + w[p] + w[p + 2 :]
    return " ".join(words)


def variant_name(name: str, k: int) -> str:
    n = name.replace("'", "")
    if n.startswith("the "):
        if k % 2 == 0:
            n = n[4:]
    elif k % 5 == 0:
        n = "the " + n
    n = n.replace("&", "and") if "&" in n else n
    if k % 3 == 0:
        n = _transpose_word(n, k)
    return n


def variant_address(addr: str, k: int) -> str:
    out = addr
    for long, short in SUFFIX_ABBREV.items():
        if long in out:
            out = out.replace(long, short if k % 2 == 0 else short.rstrip("."))
            break
    if k % 4 == 0:
        out = out.replace("suite ", "ste ")
    return out


def variant_city(city: str, k: int) -> str:
    if k % 2 == 1 and city in CITY_ALIAS:
        return CITY_ALIAS[city]
    return city


def variant_cuisine(cz: str, k: int) -> str:
    if k % 2 == 1 and cz in CUISINE_SYN:
        return CUISINE_SYN[cz]
    return cz


def build() -> list[dict]:
    rows = []
    uid = 0
    n_entities = 330
    for e in range(n_entities):
        stem = STEMS[e % len(STEMS)]
        qual = QUALIFIERS[(e // len(STEMS)) % len(QUALIFIERS)]
        name = stem + qual
        street = STREETS[e % len(STREETS)]
        number = 100 + 13 * e % 9800
        addr = f"{number} {street}"
        if e % 7 == 0:
            addr += f" suite {1 + e % 40}"
        city = CITIES[(e * 3) % len(CITIES)]
        cuisine = CUISINES[(e * 5) % len(CUISINES)]
        rows.append(
            dict(name=name, address=addr, city=city, cuisine=cuisine,
                 unique_id=uid)
        )
        # every entity has a second-source rendering; every 6th a third
        n_dups = 2 if e % 6 else 3
        for d in range(1, n_dups):
            k = e * 31 + d * 7
            rows.append(
                dict(
                    name=variant_name(name, k),
                    address=variant_address(addr, k),
                    city=variant_city(city, k),
                    cuisine=variant_cuisine(cuisine, k),
                    unique_id=uid,
                )
            )
        uid += 1
    # singletons, including near-miss precision traps: same stem,
    # different city/address => different entity
    for s in range(60):
        stem = STEMS[(s * 7) % len(STEMS)]
        rows.append(
            dict(
                name=stem + (" west" if s % 2 else " downtown"),
                address=f"{200 + 17 * s} {STREETS[(s * 11) % len(STREETS)]}",
                city=CITIES[(s * 5 + 1) % len(CITIES)],
                cuisine=CUISINES[(s * 3 + 2) % len(CUISINES)],
                unique_id=uid,
            )
        )
        uid += 1
    for i, r in enumerate(rows):
        r["record_id"] = i
    return rows


def main() -> None:
    out = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tests" / "datasets" / "restaurants_golden.csv"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    rows = build()
    with out.open("w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=["record_id", "name", "address", "city", "cuisine",
                        "unique_id"],
        )
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows -> {out}")


if __name__ == "__main__":
    main()
