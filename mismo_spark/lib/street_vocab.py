"""USPS street-address vocabulary (data constants) + pattern builders.

The tables are USPS Publication 28 Appendix C public abbreviation data,
as bundled by the reference (mismo/lib/geo/_regex_parse.py:10-595):
every known spelling of a street suffix ("STREET", "STR", "ST") mapped
to its canonical USPS abbreviation, the eight directionals, and the
occupancy/unit designators.  Pure data — the parser that consumes it is
:func:`mismo_spark.lib.address.parse_street1`.
"""

from __future__ import annotations

import functools

DIRECTIONALS: dict[str, str] = {
    "NORTH": "N",
    "SOUTH": "S",
    "EAST": "E",
    "WEST": "W",
    "NORTHEAST": "NE",
    "NORTHWEST": "NW",
    "SOUTHEAST": "SE",
    "SOUTHWEST": "SW",
}

# Every abbreviation — used carelessly this over-matches (in "123 BIG
# MOUNTAIN DRIVE" the MOUNTAIN would match as a street type if the
# pattern let it); the parser's lazy 1-4-word StreetName group prefers
# treating interior words as part of the name.
STREET_TYPES: dict[str, str] = {
    "ALLEE": "ALY", "ALLEY": "ALY", "ALLY": "ALY", "ALY": "ALY",
    "ANEX": "ANX", "ANNEX": "ANX", "ANNX": "ANX", "ANX": "ANX",
    "ARC": "ARC", "ARCADE": "ARC",
    "AV": "AVE", "AVE": "AVE", "AVEN": "AVE", "AVENU": "AVE",
    "AVENUE": "AVE", "AVN": "AVE", "AVNUE": "AVE",
    "BAYOO": "BYU", "BAYOU": "BYU",
    "BCH": "BCH", "BEACH": "BCH",
    "BEND": "BND", "BND": "BND",
    "BLF": "BLF", "BLUF": "BLF", "BLUFF": "BLF", "BLUFFS": "BLFS",
    "BOT": "BTM", "BOTTM": "BTM", "BOTTOM": "BTM", "BTM": "BTM",
    "BLVD": "BLVD", "BOUL": "BLVD", "BOULEVARD": "BLVD", "BOULV": "BLVD",
    "BR": "BR", "BRANCH": "BR", "BRNCH": "BR",
    "BRDGE": "BRG", "BRG": "BRG", "BRIDGE": "BRG",
    "BRK": "BRK", "BROOK": "BRK", "BROOKS": "BRKS",
    "BURG": "BG", "BURGS": "BGS",
    "BYP": "BYP", "BYPA": "BYP", "BYPAS": "BYP", "BYPASS": "BYP",
    "BYPS": "BYP",
    "CAMP": "CP", "CMP": "CP", "CP": "CP",
    "CANYN": "CYN", "CANYON": "CYN", "CNYN": "CYN", "CYN": "CYN",
    "CAPE": "CPE", "CPE": "CPE",
    "CAUSEWAY": "CSWY", "CAUSWAY": "CSWY", "CSWY": "CSWY",
    "CEN": "CTR", "CENT": "CTR", "CENTER": "CTR", "CENTR": "CTR",
    "CENTRE": "CTR", "CNTER": "CTR", "CNTR": "CTR", "CTR": "CTR",
    "CENTERS": "CTRS",
    "CIR": "CIR", "CIRC": "CIR", "CIRCL": "CIR", "CIRCLE": "CIR",
    "CRCL": "CIR", "CRCLE": "CIR", "CIRCLES": "CIRS",
    "CLF": "CLF", "CLIFF": "CLF", "CLFS": "CLFS", "CLIFFS": "CLFS",
    "CLB": "CLB", "CLUB": "CLB",
    "COMMON": "CMN",
    "COR": "COR", "CORNER": "COR", "CORNERS": "CORS", "CORS": "CORS",
    "COURSE": "CRSE", "CRSE": "CRSE",
    "COURT": "CT", "CRT": "CT", "CT": "CT", "COURTS": "CTS",
    "COVE": "CV", "CV": "CV", "COVES": "CVS",
    "CK": "CRK", "CR": "CRK", "CREEK": "CRK", "CRK": "CRK",
    "CRECENT": "CRES", "CRES": "CRES", "CRESCENT": "CRES",
    "CRESENT": "CRES", "CRSCNT": "CRES", "CRSENT": "CRES", "CRSNT": "CRES",
    "CREST": "CRST",
    "CROSSING": "XING", "CRSSING": "XING", "CRSSNG": "XING", "XING": "XING",
    "CROSSROAD": "XRD",
    "CURVE": "CURV",
    "DALE": "DL", "DL": "DL",
    "DAM": "DM", "DM": "DM",
    "DIV": "DV", "DIVIDE": "DV", "DV": "DV", "DVD": "DV",
    "DR": "DR", "DRIV": "DR", "DRIVE": "DR", "DRV": "DR", "DRIVES": "DRS",
    "EST": "EST", "ESTATE": "EST", "ESTATES": "ESTS", "ESTS": "ESTS",
    "EXP": "EXPY", "EXPR": "EXPY", "EXPRESS": "EXPY",
    "EXPRESSWAY": "EXPY", "EXPW": "EXPY", "EXPY": "EXPY",
    "EXT": "EXT", "EXTENSION": "EXT", "EXTN": "EXT", "EXTNSN": "EXT",
    "EXTENSIONS": "EXTS", "EXTS": "EXTS",
    "FALL": "FALL", "FALLS": "FLS", "FLS": "FLS",
    "FERRY": "FRY", "FRRY": "FRY", "FRY": "FRY",
    "FIELD": "FLD", "FLD": "FLD", "FIELDS": "FLDS", "FLDS": "FLDS",
    "FLAT": "FLT", "FLT": "FLT", "FLATS": "FLTS", "FLTS": "FLTS",
    "FORD": "FRD", "FRD": "FRD", "FORDS": "FRDS",
    "FOREST": "FRST", "FORESTS": "FRST", "FRST": "FRST",
    "FORG": "FRG", "FORGE": "FRG", "FRG": "FRG", "FORGES": "FRGS",
    "FORK": "FRK", "FRK": "FRK", "FORKS": "FRKS", "FRKS": "FRKS",
    "FORT": "FT", "FRT": "FT", "FT": "FT",
    "FREEWAY": "FWY", "FREEWY": "FWY", "FRWAY": "FWY", "FRWY": "FWY",
    "FWY": "FWY",
    "GARDEN": "GDN", "GARDN": "GDN", "GDN": "GDN", "GRDEN": "GDN",
    "GRDN": "GDN", "GARDENS": "GDNS", "GDNS": "GDNS", "GRDNS": "GDNS",
    "GATEWAY": "GTWY", "GATEWY": "GTWY", "GATWAY": "GTWY",
    "GTWAY": "GTWY", "GTWY": "GTWY",
    "GLEN": "GLN", "GLN": "GLN", "GLENS": "GLNS",
    "GREEN": "GRN", "GRN": "GRN", "GREENS": "GRNS",
    "GROV": "GRV", "GROVE": "GRV", "GRV": "GRV", "GROVES": "GRVS",
    "HARB": "HBR", "HARBOR": "HBR", "HARBR": "HBR", "HBR": "HBR",
    "HRBOR": "HBR", "HARBORS": "HBRS",
    "HAVEN": "HVN", "HAVN": "HVN", "HVN": "HVN",
    "HEIGHT": "HTS", "HEIGHTS": "HTS", "HGTS": "HTS", "HT": "HTS",
    "HTS": "HTS",
    "HIGHWAY": "HWY", "HIGHWY": "HWY", "HIWAY": "HWY", "HIWY": "HWY",
    "HWAY": "HWY", "HWY": "HWY",
    "HILL": "HL", "HL": "HL", "HILLS": "HLS", "HLS": "HLS",
    "HLLW": "HOLW", "HOLLOW": "HOLW", "HOLLOWS": "HOLW", "HOLW": "HOLW",
    "HOLWS": "HOLW",
    "INLET": "INLT", "INLT": "INLT",
    "IS": "IS", "ISLAND": "IS", "ISLND": "IS",
    "ISLANDS": "ISS", "ISLNDS": "ISS", "ISS": "ISS",
    "ISLE": "ISLE", "ISLES": "ISLE",
    "JCT": "JCT", "JCTION": "JCT", "JCTN": "JCT", "JUNCTION": "JCT",
    "JUNCTN": "JCT", "JUNCTON": "JCT",
    "JCTNS": "JCTS", "JCTS": "JCTS", "JUNCTIONS": "JCTS",
    "KEY": "KY", "KY": "KY", "KEYS": "KYS", "KYS": "KYS",
    "KNL": "KNL", "KNOL": "KNL", "KNOLL": "KNL",
    "KNLS": "KNLS", "KNOLLS": "KNLS",
    "LAKE": "LK", "LK": "LK", "LAKES": "LKS", "LKS": "LKS",
    "LAND": "LAND",
    "LANDING": "LNDG", "LNDG": "LNDG", "LNDNG": "LNDG",
    "LA": "LN", "LANE": "LN", "LANES": "LN", "LN": "LN",
    "LGT": "LGT", "LIGHT": "LGT", "LIGHTS": "LGTS",
    "LF": "LF", "LOAF": "LF",
    "LCK": "LCK", "LOCK": "LCK", "LCKS": "LCKS", "LOCKS": "LCKS",
    "LDG": "LDG", "LDGE": "LDG", "LODG": "LDG", "LODGE": "LDG",
    "LP": "LOOP", "LOOP": "LOOP", "LOOPS": "LOOP",
    "MALL": "MALL",
    "MANOR": "MNR", "MNR": "MNR", "MANORS": "MNRS", "MNRS": "MNRS",
    "MDW": "MDW", "MEADOW": "MDW",
    "MDWS": "MDWS", "MEADOWS": "MDWS", "MEDOWS": "MDWS",
    "MEWS": "MEWS",
    "MILL": "ML", "ML": "ML", "MILLS": "MLS", "MLS": "MLS",
    "MISSION": "MSN", "MISSN": "MSN", "MSN": "MSN", "MSSN": "MSN",
    "MOTORWAY": "MTWY",
    "MNT": "MT", "MOUNT": "MT", "MT": "MT",
    "MNTAIN": "MTN", "MNTN": "MTN", "MOUNTAIN": "MTN", "MOUNTIN": "MTN",
    "MTIN": "MTN", "MTN": "MTN",
    "MNTNS": "MTNS", "MOUNTAINS": "MTNS",
    "NCK": "NCK", "NECK": "NCK",
    "ORCH": "ORCH", "ORCHARD": "ORCH", "ORCHRD": "ORCH",
    "OVAL": "OVAL", "OVL": "OVAL",
    "OVERPASS": "OPAS",
    "PARK": "PARK", "PK": "PARK", "PRK": "PARK", "PARKS": "PARK",
    "PARKWAY": "PKWY", "PARKWY": "PKWY", "PKWAY": "PKWY", "PKWY": "PKWY",
    "PKY": "PKWY", "PARKWAYS": "PKWY", "PKWYS": "PKWY",
    "PASS": "PASS", "PASSAGE": "PSGE",
    "PATH": "PATH", "PATHS": "PATH",
    "PIKE": "PIKE", "PIKES": "PIKE",
    "PINE": "PNE", "PINES": "PNES", "PNES": "PNES",
    "PL": "PL", "PLACE": "PL",
    "PLAIN": "PLN", "PLN": "PLN",
    "PLAINES": "PLNS", "PLAINS": "PLNS", "PLNS": "PLNS",
    "PLAZA": "PLZ", "PLZ": "PLZ", "PLZA": "PLZ",
    "POINT": "PT", "PT": "PT", "POINTS": "PTS", "PTS": "PTS",
    "PORT": "PRT", "PRT": "PRT", "PORTS": "PRTS", "PRTS": "PRTS",
    "PR": "PR", "PRAIRIE": "PR", "PRARIE": "PR", "PRR": "PR",
    "RAD": "RADL", "RADIAL": "RADL", "RADIEL": "RADL", "RADL": "RADL",
    "RAMP": "RAMP",
    "RANCH": "RNCH", "RANCHES": "RNCH", "RNCH": "RNCH", "RNCHS": "RNCH",
    "RAPID": "RPD", "RPD": "RPD", "RAPIDS": "RPDS", "RPDS": "RPDS",
    "REST": "RST", "RST": "RST",
    "RDG": "RDG", "RDGE": "RDG", "RIDGE": "RDG",
    "RDGS": "RDGS", "RIDGES": "RDGS",
    "RIV": "RIV", "RIVER": "RIV", "RIVR": "RIV", "RVR": "RIV",
    "RD": "RD", "ROAD": "RD", "RDS": "RDS", "ROADS": "RDS",
    "ROUTE": "RTE", "ROW": "ROW", "RUE": "RUE", "RUN": "RUN",
    "SHL": "SHL", "SHOAL": "SHL", "SHLS": "SHLS", "SHOALS": "SHLS",
    "SHOAR": "SHR", "SHORE": "SHR", "SHR": "SHR",
    "SHOARS": "SHRS", "SHORES": "SHRS", "SHRS": "SHRS",
    "SKYWAY": "SKWY",
    "SPG": "SPG", "SPNG": "SPG", "SPRING": "SPG", "SPRNG": "SPG",
    "SPGS": "SPGS", "SPNGS": "SPGS", "SPRINGS": "SPGS", "SPRNGS": "SPGS",
    "SPUR": "SPUR", "SPURS": "SPUR",
    "SQ": "SQ", "SQR": "SQ", "SQRE": "SQ", "SQU": "SQ", "SQUARE": "SQ",
    "SQRS": "SQS", "SQUARES": "SQS",
    "STA": "STA", "STATION": "STA", "STATN": "STA", "STN": "STA",
    "STRA": "STRA", "STRAV": "STRA", "STRAVE": "STRA", "STRAVEN": "STRA",
    "STRAVENUE": "STRA", "STRAVN": "STRA", "STRVN": "STRA",
    "STRVNUE": "STRA",
    "STREAM": "STRM", "STREME": "STRM", "STRM": "STRM",
    "ST": "ST", "STR": "ST", "STREET": "ST", "STRT": "ST",
    "STREETS": "STS",
    "SMT": "SMT", "SUMIT": "SMT", "SUMITT": "SMT", "SUMMIT": "SMT",
    "TER": "TER", "TERR": "TER", "TERRACE": "TER",
    "THROUGHWAY": "TRWY",
    "TRACE": "TRCE", "TRACES": "TRCE", "TRCE": "TRCE",
    "TRACK": "TRAK", "TRACKS": "TRAK", "TRAK": "TRAK", "TRK": "TRAK",
    "TRKS": "TRAK",
    "TRAFFICWAY": "TRFY", "TRFY": "TRFY",
    "TR": "TRL", "TRAIL": "TRL", "TRAILS": "TRL", "TRL": "TRL",
    "TRLS": "TRL",
    "TUNEL": "TUNL", "TUNL": "TUNL", "TUNLS": "TUNL", "TUNNEL": "TUNL",
    "TUNNELS": "TUNL", "TUNNL": "TUNL",
    "TPK": "TPKE", "TPKE": "TPKE", "TRNPK": "TPKE", "TRPK": "TPKE",
    "TURNPIKE": "TPKE", "TURNPK": "TPKE",
    "UNDERPASS": "UPAS",
    "UN": "UN", "UNION": "UN", "UNIONS": "UNS",
    "VALLEY": "VLY", "VALLY": "VLY", "VLLY": "VLY", "VLY": "VLY",
    "VALLEYS": "VLYS", "VLYS": "VLYS",
    "VDCT": "VIA", "VIA": "VIA", "VIADCT": "VIA", "VIADUCT": "VIA",
    "VIEW": "VW", "VW": "VW", "VIEWS": "VWS", "VWS": "VWS",
    "VILL": "VLG", "VILLAG": "VLG", "VILLAGE": "VLG", "VILLG": "VLG",
    "VILLIAGE": "VLG", "VLG": "VLG", "VILLAGES": "VLGS", "VLGS": "VLGS",
    "VILLE": "VL", "VL": "VL",
    "VIS": "VIS", "VIST": "VIS", "VISTA": "VIS", "VST": "VIS",
    "VSTA": "VIS",
    "WALK": "WALK", "WALKS": "WALK", "WALL": "WALL",
    "WAY": "WAY", "WY": "WAY", "WAYS": "WAYS",
    "WELL": "WL", "WELLS": "WLS", "WLS": "WLS",
}

OCCUPANCY_TYPES: dict[str, str] = {
    "APT": "UNIT", "APRT": "UNIT", "APARTMENT": "UNIT", "APTMT": "UNIT",
    "BUILDING": "BLDG", "BASEMENT": "BSMT", "DEPARTMENT": "DEPT",
    "FLOOR": "FL", "FRONT": "FRNT", "HANGER": "HNGR", "KEY": "KEY",
    "LOBBY": "LBBY", "LOT": "UNIT", "LOWER": "LOWR", "OFC": "UNIT",
    "OFFICE": "UNIT", "PENTHOUSE": "PH", "PIER": "PIER", "REAR": "REAR",
    "RM": "UNIT", "ROOM": "UNIT", "SIDE": "SIDE", "SLIP": "SLIP",
    "SP": "UNIT", "SPC": "UNIT", "SPACE": "UNIT", "STOP": "STOP",
    "STE": "UNIT", "SUITE": "UNIT", "TRLR": "UNIT", "TRAILER": "UNIT",
    "UNIT": "UNIT", "#": "UNIT", "NO": "UNIT", "NUMBER": "UNIT",
    "UPPER": "UPPER",
}


def alternation(*options: str) -> str:
    """Regex alternation, LONGEST-FIRST so "STREET" wins over "ST"
    (alternation in regex engines is first-match, not longest-match)."""
    return "|".join(sorted(set(options), key=len, reverse=True))


@functools.cache
def directionals_pattern() -> str:
    return alternation(*DIRECTIONALS.keys(), *DIRECTIONALS.values())


@functools.cache
def street_types_pattern() -> str:
    return alternation(*STREET_TYPES.keys(), *STREET_TYPES.values())


@functools.cache
def street1_pattern() -> str:
    """One pattern for an (uppercased) street1 line: either a street
    address — number, optional pre-directional, 1-4 word name
    (preferring fewer), optional post-type, optional post-directional —
    or a PO-box form.  Capture groups, in order: AddressNumber,
    StreetNamePreDirectional, StreetName, StreetNamePostType,
    StreetNamePostDirectional, USPSBoxID.  Same component grammar as the
    reference's parser (mismo/lib/geo/_regex_parse.py:596-651)."""
    d = directionals_pattern()
    t = street_types_pattern()
    street = (
        r"^\s*"
        r"(?:MILE\s+)?"
        r"(\d+(?:\.\d+|\S+)?)"       # AddressNumber
        rf"(?:\s+({d})\.?)?"          # StreetNamePreDirectional
        r"\s+"
        r"((?:\S+\s+){0,3}?\S+)"      # StreetName: 1-4 words, prefer fewer
        rf"(?:\s+({t})\.?)?"          # StreetNamePostType
        rf"(?:\s+({d})\.?)?"          # StreetNamePostDirectional
        r"\s*$"
    )
    po = alternation(
        r"P\.? ?O\.? ?BOX", r"P\.? ?BOX", r"O\.? ?BOX", "BOX",
        r"P\.? ?O\.? ?B\.?", r"P\.? ?O\.?",
    )
    po_box = (
        r"^\s*"
        r"(?:(?:RURAL ROUTE|RR|HC|PSC|CMR)\s+\S+\s+)?"
        rf"(?:{po})"
        r"\s+"
        r"(.+?)"                      # USPSBoxID
        r"\s*$"
    )
    return f"(?:{street})|(?:{po_box})"
