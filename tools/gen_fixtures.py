#!/usr/bin/env python3
"""Deterministic fixture generator (dev tool; outputs are committed).

Produces the three reference-shaped inputs of FIXTURES.md:
  fixtures/journey.csv      - messy space-named headers, dd/MM/yyyy HH:mm dates
  fixtures/stations.csv     - dotted `Station.Id` header, one row with nulls
  fixtures/weather_v1.json  - nested root + days[], WITH severerisk (drift vintage A)
  fixtures/weather_v2.json  - same, WITHOUT severerisk (drift vintage B)

No randomness: every value is a fixed formula of the row index.
"""
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
os.makedirs(OUT, exist_ok=True)

# ---- stations.csv (10 rows; station 9 has null name + null Northing) ----
stations_header = "Station.Id,StationName,longitude,latitude,Easting,Northing"
station_names = [
    "River Street, Clerkenwell",
    "Phillimore Gardens, Kensington",
    "Christopher Street, Liverpool Street",
    "St. Chad's Street, King's Cross",
    "Sedding Street, Sloane Square",
    "Broadcasting House, Marylebone",
    "Charlbert Street, St. John's Wood",
    "Lodge Road, St. John's Wood",
    None,  # missing name -> exercises null counting in the profile
    "Park Street, Bankside",
]
rows = [stations_header]
for i, name in enumerate(station_names, start=1):
    lon = round(-0.10 - i * 0.01, 6)
    lat = round(51.49 + i * 0.005, 6)
    easting = round(531202.5 + i * 37.25, 3)
    northing = "" if name is None else round(182832.0 + i * 21.5, 3)
    namecell = "" if name is None else f'"{name}"'
    rows.append(f"{i},{namecell},{lon},{lat},{easting},{northing}")
with open(f"{OUT}/stations.csv", "w") as f:
    f.write("\n".join(rows) + "\n")

# ---- journey.csv (24 rows) ----
# Requirements (FIXTURES.md §1): unknown station ids (777/888/999) driving the
# NOT-IN anti-join; two rentals sharing a start minute; quoted comma names;
# rows spanning the Jan->Feb month boundary.
journey_header = ("Rental Id,Duration,Bike Id,End Date,EndStation Id,"
                  "EndStation Name,Start Date,StartStation Id,StartStation Name")
known = {i: station_names[i - 1] or "Unnamed Dock" for i in range(1, 11)}
unknown = {777: "Pop Up Dock, Olympic Way",
           888: "Guildhall, City of London",
           999: "Canada Water, Rotherhithe"}
name_of = {**known, **unknown}

def dt(day, month, hh, mm):
    return f"{day:02d}/{month:02d}/2021 {hh:02d}:{mm:02d}"

journeys = []
# (rental, bike, start_station, end_station, start(d,m,hh,mm), dur_minutes)
specs = [
    (101, 17497, 1, 2, (15, 1, 8, 5), 23),
    (102, 4677, 2, 3, (15, 1, 8, 5), 41),    # same start minute as 101
    (103, 9012, 3, 1, (15, 1, 9, 30), 15),
    (104, 3301, 4, 777, (16, 1, 10, 0), 55),  # unknown end station
    (105, 3302, 777, 5, (16, 1, 12, 45), 30),  # unknown start station
    (106, 1203, 5, 5, (17, 1, 7, 59), 12),    # same start/end
    (107, 7704, 6, 8, (18, 1, 17, 20), 95),
    (108, 7705, 888, 888, (19, 1, 18, 3), 8),  # unknown both sides
    (109, 2210, 7, 9, (20, 1, 6, 15), 27),
    (110, 2211, 9, 10, (21, 1, 14, 40), 66),
    (111, 5520, 10, 999, (22, 1, 20, 5), 44),  # unknown end
    (112, 5521, 999, 1, (23, 1, 21, 50), 19),  # unknown start (same id both roles)
    (113, 6001, 1, 4, (24, 1, 11, 11), 33),
    (114, 6002, 2, 6, (25, 1, 13, 0), 21),
    (115, 6003, 3, 7, (26, 1, 15, 25), 48),
    (116, 6004, 4, 8, (27, 1, 16, 35), 52),
    (117, 6005, 5, 9, (28, 1, 19, 45), 14),
    (118, 6006, 6, 10, (29, 1, 22, 10), 39),
    (119, 6007, 7, 1, (30, 1, 23, 30), 25),
    (120, 6008, 8, 2, (31, 1, 23, 58), 14),   # crosses the month boundary
    (121, 6009, 9, 3, (31, 1, 23, 58), 20),   # same start minute as 120
    (122, 6010, 10, 4, (1, 2, 0, 30), 18),
    (123, 6011, 1, 5, (5, 2, 8, 5), 60),      # repeats 15/01 08:05's hh:mm on a new day
    (124, 6012, 2, 6, (10, 2, 12, 0), 35),
]
rows = [journey_header]
for rental, bike, ss, es, (d, m, hh, mm), dur in specs:
    start = dt(d, m, hh, mm)
    total = hh * 60 + mm + dur
    ed, em = d, m
    if total >= 24 * 60:
        total -= 24 * 60
        ed, em = (d + 1, m) if d < 31 else (1, m + 1)
    end = dt(ed, em, total // 60, total % 60)
    rows.append(f'{rental},{dur * 60},{bike},{end},{es},"{name_of[es]}",'
                f'{start},{ss},"{name_of[ss]}"')
with open(f"{OUT}/journey.csv", "w") as f:
    f.write("\n".join(rows) + "\n")

# ---- weather_v1.json / weather_v2.json ----
# 41 days, 2021-01-01 .. 2021-02-10: covers every journey weather_date so the
# star schema's weather_date FK is satisfiable (the reference's weather file
# likewise spans the whole journey period).
import datetime

N_DAYS = 41

def day(i, with_severerisk):
    d = {
        "datetime": (datetime.date(2021, 1, 1)
                     + datetime.timedelta(days=i)).isoformat(),
        "datetimeEpoch": 1609459200 + i * 86400,
        "tempmax": round(5.0 + 0.3 * i, 2),
        "tempmin": round(-0.5 + 0.2 * i, 2),
        "temp": round(2.1 + 0.25 * i, 2),
        "feelslikemax": round(2.9 + 0.3 * i, 2),
        "feelslikemin": round(-3.6 + 0.2 * i, 2),
        "feelslike": round(-0.2 + 0.25 * i, 2),
        "dew": round(0.8 + 0.1 * i, 2),
        "humidity": round(91.03 - 1.5 * i, 2),
        "precip": round(0.22 * (i % 5), 2),
        "precipprob": None,            # 100% missing -> dropped (>70% rule)
        "precipcover": round(4.17 + i, 2),
        "preciptype": ["rain"] if i % 4 == 0 else None,
        "snow": None,                  # 100% missing -> dropped
        "snowdepth": None,             # 100% missing -> dropped
        "windgust": None if i % 3 == 0 else round(18.0 + i, 2),  # ~36% missing -> kept
        "windspeed": round(10.6 + 0.5 * i, 2),
        "winddir": round((304.0 + 10 * i) % 360, 2),
        "pressure": round(1011.6 + 0.4 * i, 2),
        "cloudcover": round(0.5 + 2 * i, 2),
        "visibility": round(4.1 + 0.3 * i, 2),
        "solarradiation": round(29.4 + 2 * i, 2),
        "solarenergy": round(0.8 + 0.2 * i, 2),
        "uvindex": float(i % 4),
        "sunrise": f"08:{(6 - i // 3) % 60:02d}:14",
        "sunriseEpoch": 1609488374 + i * 86340,
        "sunset": f"16:{(2 + i // 2):02d}:22",
        "sunsetEpoch": 1609516942 + i * 86460,
        "moonphase": round((0.53 + 0.03 * i) % 1.0, 2),
        "conditions": "Rain" if i % 5 == 0 else "Partially cloudy",
        "description": "Clear conditions with late rain." if i % 5 == 0
                       else "Partly cloudy throughout the day.",
        "icon": "rain" if i % 5 == 0 else "partly-cloudy-day",
        "stations": ["03769099999", "D5621"],
        "source": "obs",
        "tzoffset": None if i % 2 == 0 else 0.0,  # 50% missing -> kept
    }
    if with_severerisk:
        # present only in vintage A, and >70% null there (non-null on fewer
        # than 30% of days regardless of N_DAYS) -> always dropped
        d["severerisk"] = 30.0 + i if i % 5 == 4 else None
    return d

for variant, with_sev in (("v1", True), ("v2", False)):
    root = {
        "latitude": 51.5064,
        "longitude": -0.12721,
        "resolvedAddress": "London,UK",
        "address": "London,UK",
        "timezone": "Europe/London",
        "days": [day(i, with_sev) for i in range(N_DAYS)],
    }
    with open(f"{OUT}/weather_{variant}.json", "w") as f:
        json.dump(root, f, indent=1)

print("fixtures written to", os.path.abspath(OUT))
