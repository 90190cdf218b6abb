"""Generate the bundled band plans (SDR++-compatible JSON format).

Authored independently from public ITU/IARU allocation data (regional
amateur band edges, broadcast bands, common VHF/UHF services) — the
FORMAT matches the reference's loader (``core/src/gui/widgets/bandplan``),
the data is composed here, not copied.  Run from this directory:

    python generate_plans.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

K = 1e3
M = 1e6
G = 1e9


def band(name, typ, start, end):
    return {"name": name, "type": typ, "start": float(start), "end": float(end)}


# Common worldwide allocations
SW_BROADCAST = [
    band("120m Broadcast", "broadcast", 2300 * K, 2495 * K),
    band("90m Broadcast", "broadcast", 3200 * K, 3400 * K),
    band("49m Broadcast", "broadcast", 5900 * K, 6200 * K),
    band("41m Broadcast", "broadcast", 7200 * K, 7450 * K),
    band("31m Broadcast", "broadcast", 9400 * K, 9900 * K),
    band("25m Broadcast", "broadcast", 11600 * K, 12100 * K),
    band("22m Broadcast", "broadcast", 13570 * K, 13870 * K),
    band("19m Broadcast", "broadcast", 15100 * K, 15800 * K),
    band("16m Broadcast", "broadcast", 17480 * K, 17900 * K),
    band("13m Broadcast", "broadcast", 21450 * K, 21850 * K),
]
HF_AMATEUR_COMMON = [
    band("30m Amateur", "amateur", 10100 * K, 10150 * K),
    band("20m Amateur", "amateur", 14000 * K, 14350 * K),
    band("17m Amateur", "amateur", 18068 * K, 18168 * K),
    band("15m Amateur", "amateur", 21000 * K, 21450 * K),
    band("12m Amateur", "amateur", 24890 * K, 24990 * K),
    band("10m Amateur", "amateur", 28000 * K, 29700 * K),
]
AIR_MARINE = [
    band("Airband VHF", "aviation", 108 * M, 137 * M),
    band("Marine VHF", "marine", 156 * M, 162.025 * M),
    band("AIS", "marine", 161.975 * M, 162.025 * M),
]
SATCOM = [
    band("Weather Satellite", "satellite", 137 * M, 138 * M),
    band("GPS L1", "satellite", 1574.42 * M, 1576.42 * M),
    band("ADS-B 1090", "aviation", 1089 * M, 1091 * M),
    band("Inmarsat L", "satellite", 1525 * M, 1559 * M),
]
ISM_WW = [band("ISM 2.4 GHz", "ism", 2400 * M, 2483.5 * M)]


def region1_amateur(four_m=False, eighty_end=3800 * K):
    out = [
        band("2200m Amateur", "amateur", 135.7 * K, 137.8 * K),
        band("630m Amateur", "amateur", 472 * K, 479 * K),
        band("160m Amateur", "amateur", 1810 * K, 2000 * K),
        band("80m Amateur", "amateur", 3500 * K, eighty_end),
        band("60m Amateur", "amateur", 5351.5 * K, 5366.5 * K),
        band("40m Amateur", "amateur", 7000 * K, 7200 * K),
        *HF_AMATEUR_COMMON,
        band("6m Amateur", "amateur", 50 * M, 52 * M),
        band("2m Amateur", "amateur", 144 * M, 146 * M),
        band("70cm Amateur", "amateur", 430 * M, 440 * M),
        band("23cm Amateur", "amateur", 1240 * M, 1300 * M),
        band("13cm Amateur", "amateur", 2320 * M, 2450 * M),
    ]
    if four_m:
        out.insert(-4, band("4m Amateur", "amateur", 70 * M, 70.5 * M))
    return out


def region2_amateur(seventycm_start=430 * M):
    return [
        band("2200m Amateur", "amateur", 135.7 * K, 137.8 * K),
        band("630m Amateur", "amateur", 472 * K, 479 * K),
        band("160m Amateur", "amateur", 1800 * K, 2000 * K),
        band("80m Amateur", "amateur", 3500 * K, 4000 * K),
        band("60m Amateur", "amateur", 5330.5 * K, 5406.4 * K),
        band("40m Amateur", "amateur", 7000 * K, 7300 * K),
        *HF_AMATEUR_COMMON,
        band("6m Amateur", "amateur", 50 * M, 54 * M),
        band("2m Amateur", "amateur", 144 * M, 148 * M),
        band("1.25m Amateur", "amateur", 222 * M, 225 * M),
        band("70cm Amateur", "amateur", seventycm_start, 450 * M),
        band("33cm Amateur", "amateur", 902 * M, 928 * M),
        band("23cm Amateur", "amateur", 1240 * M, 1300 * M),
    ]


def region3_amateur(two_m_end=148 * M, seventycm=(430 * M, 450 * M)):
    return [
        band("160m Amateur", "amateur", 1800 * K, 2000 * K),
        band("80m Amateur", "amateur", 3500 * K, 3900 * K),
        band("40m Amateur", "amateur", 7000 * K, 7200 * K),
        *HF_AMATEUR_COMMON,
        band("6m Amateur", "amateur", 50 * M, 54 * M),
        band("2m Amateur", "amateur", 144 * M, two_m_end),
        band("70cm Amateur", "amateur", seventycm[0], seventycm[1]),
        band("23cm Amateur", "amateur", 1240 * M, 1300 * M),
    ]


def eu_common():
    return [
        band("LW Broadcast", "broadcast", 148.5 * K, 283.5 * K),
        band("MW Broadcast", "broadcast", 526.5 * K, 1606.5 * K),
        *SW_BROADCAST,
        band("CB", "cb", 26.965 * M, 27.405 * M),
        band("FM Broadcast", "broadcast", 87.5 * M, 108 * M),
        band("DAB Band III", "broadcast", 174 * M, 240 * M),
        *AIR_MARINE,
        band("PMR446", "pmr", 446.0 * M, 446.2 * M),
        band("ISM 433", "ism", 433.05 * M, 434.79 * M),
        band("ISM 868", "ism", 863 * M, 870 * M),
        *SATCOM,
        *ISM_WW,
    ]


def na_common():
    return [
        band("MW Broadcast", "broadcast", 525 * K, 1705 * K),
        *SW_BROADCAST,
        band("CB", "cb", 26.965 * M, 27.405 * M),
        band("FM Broadcast", "broadcast", 87.9 * M, 107.9 * M),
        *AIR_MARINE,
        band("NOAA Weather", "broadcast", 162.4 * M, 162.55 * M),
        band("MURS", "pmr", 151.82 * M, 154.6 * M),
        band("FRS/GMRS", "pmr", 462.55 * M, 467.725 * M),
        band("ISM 915", "ism", 902 * M, 928 * M),
        *SATCOM,
        *ISM_WW,
    ]


def plan(fname, name, country_name, country_code, bands):
    bands = sorted(bands, key=lambda b: b["start"])
    doc = {
        "name": name,
        "country_name": country_name,
        "country_code": country_code,
        "author_name": "sdrtpu",
        "author_url": "",
        "bands": bands,
    }
    with open(os.path.join(HERE, fname), "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")


def main():
    eu = [
        ("germany.json", "Germany", "Germany", "DE", True),
        ("france.json", "France", "France", "FR", True),
        ("united-kingdom.json", "United Kingdom", "United Kingdom", "GB", True),
        ("italy.json", "Italy", "Italy", "IT", False),
        ("netherlands.json", "Netherlands", "Netherlands", "NL", True),
        ("belgium.json", "Belgium", "Belgium", "BE", False),
        ("austria.json", "Austria", "Austria", "AT", False),
        ("ireland.json", "Ireland", "Ireland", "IE", True),
        ("slovakia.json", "Slovakia", "Slovakia", "SK", True),
        ("turkey.json", "Turkey", "Turkey", "TR", False),
    ]
    for fname, name, cname, code, four_m in eu:
        plan(fname, name, cname, code, eu_common() + region1_amateur(four_m))

    # Russia: Region 1 + OIRT FM band
    plan("russia.json", "Russia", "Russian Federation", "RU",
         eu_common() + region1_amateur()
         + [band("OIRT FM Broadcast", "broadcast", 65.9 * M, 74 * M)])

    plan("usa.json", "USA", "United States of America", "US",
         na_common() + region2_amateur(seventycm_start=420 * M))
    plan("canada.json", "Canada", "Canada", "CA",
         na_common() + region2_amateur(seventycm_start=430 * M))
    plan("brazil.json", "Brazil", "Brazil", "BR", [
        band("MW Broadcast", "broadcast", 525 * K, 1705 * K),
        *SW_BROADCAST,
        band("FM Broadcast", "broadcast", 76 * M, 108 * M),
        *AIR_MARINE, *SATCOM, *ISM_WW,
        *region2_amateur(seventycm_start=430 * M),
    ])

    plan("china.json", "China", "People's Republic of China", "CN", [
        band("MW Broadcast", "broadcast", 526.5 * K, 1606.5 * K),
        *SW_BROADCAST,
        band("FM Broadcast", "broadcast", 87 * M, 108 * M),
        *AIR_MARINE, *SATCOM, *ISM_WW,
        *region3_amateur(two_m_end=148 * M, seventycm=(430 * M, 440 * M)),
    ])
    plan("republic-of-korea.json", "Republic of Korea", "Republic of Korea",
         "KR", [
             band("MW Broadcast", "broadcast", 526.5 * K, 1606.5 * K),
             *SW_BROADCAST,
             band("FM Broadcast", "broadcast", 88 * M, 108 * M),
             *AIR_MARINE, *SATCOM, *ISM_WW,
             *region3_amateur(two_m_end=146 * M, seventycm=(430 * M, 440 * M)),
         ])
    plan("australia.json", "Australia", "Australia", "AU", [
        band("MW Broadcast", "broadcast", 526.5 * K, 1706.5 * K),
        *SW_BROADCAST,
        band("FM Broadcast", "broadcast", 87.5 * M, 108 * M),
        band("UHF CB", "cb", 476.4 * M, 477.4 * M),
        *AIR_MARINE, *SATCOM, *ISM_WW,
        *region3_amateur(two_m_end=148 * M, seventycm=(420 * M, 450 * M)),
        band("ISM 915 AU", "ism", 915 * M, 928 * M),
    ])

    # QO-100 / Es'hail-2 amateur transponders
    plan("qo-100.json", "QO-100", "--", "--", [
        band("NB Uplink", "satellite", 2400.05 * M, 2400.3 * M),
        band("WB Uplink", "satellite", 2401.5 * M, 2409.5 * M),
        band("NB Downlink", "satellite", 10489.55 * M, 10489.995 * M),
        band("WB Downlink", "satellite", 10491 * M, 10499 * M),
    ])

    # German cellular allocations (public BNetzA band structure)
    lte = [
        ("B28 700 Uplink", 703 * M, 733 * M), ("B28 700 Downlink", 758 * M, 788 * M),
        ("B20 800 Uplink", 832 * M, 862 * M), ("B20 800 Downlink", 791 * M, 821 * M),
        ("B8 900 Uplink", 880 * M, 915 * M), ("B8 900 Downlink", 925 * M, 960 * M),
        ("B3 1800 Uplink", 1710 * M, 1785 * M), ("B3 1800 Downlink", 1805 * M, 1880 * M),
        ("B1 2100 Uplink", 1920 * M, 1980 * M), ("B1 2100 Downlink", 2110 * M, 2170 * M),
        ("B7 2600 Uplink", 2500 * M, 2570 * M), ("B7 2600 Downlink", 2620 * M, 2690 * M),
        ("n78 3.6 GHz TDD", 3400 * M, 3700 * M),
    ]
    plan("germany-mobile-lte-bands.json", "Germany Mobile LTE Bands",
         "Germany", "DE", [band(n, "cellular", s, e) for n, s, e in lte])
    nets = [
        ("Telekom 900", 925 * M, 935 * M), ("Vodafone 900", 935 * M, 945 * M),
        ("O2 900", 945 * M, 960 * M),
        ("Telekom 800 DL", 791 * M, 801 * M), ("Vodafone 800 DL", 801 * M, 811 * M),
        ("O2 800 DL", 811 * M, 821 * M),
        ("Telekom 1800 DL", 1805 * M, 1830 * M),
        ("Vodafone 1800 DL", 1830 * M, 1855 * M),
        ("O2 1800 DL", 1855 * M, 1880 * M),
    ]
    plan("germany-mobile-networks.json", "Germany Mobile Networks",
         "Germany", "DE", [band(n, "cellular", s, e) for n, s, e in nets])
    print("wrote", len(os.listdir(HERE)) - 1, "plans")


if __name__ == "__main__":
    main()
