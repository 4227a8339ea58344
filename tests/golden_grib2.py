"""Hand-assembled GRIB2 golden message, written from the WMO FM 92
(GRIB edition 2) section/octet layout — NOT produced by the in-repo
codec. Octet numbers in comments are the 1-based positions from the
spec's section tables, so a codec that is self-consistently wrong about
any offset fails against this fixture.

Message: one TMP field (discipline 0, category 0, number 0) at
850 hPa on a 3×4 regular lat/lon grid, lat 50→48 (north to south),
lon 1→4 east, reference time 2024-03-01 06:00, +3 h forecast,
simple packing with R=270.0, E=-5, D=0, 8 bits:
values[j, i] = 270.0 + 0.5 * (4 * j + i).
"""

import struct

import numpy as np

GOLDEN_VALUES = 270.0 + 0.5 * np.arange(12, dtype=np.float64).reshape(3, 4)
GOLDEN_LAT = np.array([50.0, 49.0, 48.0])
GOLDEN_LON = np.array([1.0, 2.0, 3.0, 4.0])


def u(value, width):
    return int(value).to_bytes(width, "big")


def assemble_golden() -> bytes:
    # ---- Section 1: Identification (21 octets) -----------------------
    sec1 = b"".join([
        u(21, 4),       # 1-4   section length
        u(1, 1),        # 5     section number
        u(85, 2),       # 6-7   originating centre (Météo-France)
        u(0, 2),        # 8-9   subcentre
        u(2, 1),        # 10    master tables version
        u(1, 1),        # 11    local tables version
        u(1, 1),        # 12    significance of reference time (fcst start)
        u(2024, 2),     # 13-14 year
        u(3, 1),        # 15    month
        u(1, 1),        # 16    day
        u(6, 1),        # 17    hour
        u(0, 1),        # 18    minute
        u(0, 1),        # 19    second
        u(0, 1),        # 20    production status (operational)
        u(1, 1),        # 21    type of processed data (forecast)
    ])
    # ---- Section 3: Grid definition, template 3.0 (72 octets) --------
    sec3 = b"".join([
        u(72, 4),               # 1-4   section length
        u(3, 1),                # 5     section number
        u(0, 1),                # 6     source of grid definition
        u(12, 4),               # 7-10  number of data points
        u(0, 1),                # 11    octets for optional list
        u(0, 1),                # 12    interpretation of list
        u(0, 2),                # 13-14 grid definition template 3.0
        u(6, 1),                # 15    shape of earth (sphere r=6371229)
        u(0xFF, 1),             # 16    scale factor radius (missing)
        u(0xFFFFFFFF, 4),       # 17-20 scaled value radius (missing)
        u(0xFF, 1),             # 21    scale factor major axis (missing)
        u(0xFFFFFFFF, 4),       # 22-25 scaled value major axis (missing)
        u(0xFF, 1),             # 26    scale factor minor axis (missing)
        u(0xFFFFFFFF, 4),       # 27-30 scaled value minor axis (missing)
        u(4, 4),                # 31-34 Ni (points along a parallel)
        u(3, 4),                # 35-38 Nj (points along a meridian)
        u(0, 4),                # 39-42 basic angle
        u(0, 4),                # 43-46 subdivisions of basic angle
        u(50_000_000, 4),       # 47-50 La1 (first lat, microdegrees)
        u(1_000_000, 4),        # 51-54 Lo1 (first lon)
        u(0x30, 1),             # 55    resolution/component flags (Di, Dj given)
        u(48_000_000, 4),       # 56-59 La2 (last lat)
        u(4_000_000, 4),        # 60-63 Lo2 (last lon)
        u(1_000_000, 4),        # 64-67 Di (i increment)
        u(1_000_000, 4),        # 68-71 Dj (j increment)
        u(0x00, 1),             # 72    scanning mode (+i, -j, row-major)
    ])
    # ---- Section 4: Product definition, template 4.0 (34 octets) -----
    sec4 = b"".join([
        u(34, 4),               # 1-4   section length
        u(4, 1),                # 5     section number
        u(0, 2),                # 6-7   coordinate values after template
        u(0, 2),                # 8-9   product definition template 4.0
        u(0, 1),                # 10    parameter category (temperature)
        u(0, 1),                # 11    parameter number (TMP)
        u(2, 1),                # 12    generating process (forecast)
        u(255, 1),              # 13    background process id
        u(255, 1),              # 14    forecast process id
        u(0, 2),                # 15-16 hours after cutoff
        u(0, 1),                # 17    minutes after cutoff
        u(1, 1),                # 18    time unit (hour)
        u(3, 4),                # 19-22 forecast time (+3 h)
        u(100, 1),              # 23    type of first surface (isobaric)
        u(0, 1),                # 24    scale factor of first surface
        u(85_000, 4),           # 25-28 scaled value (850 hPa in Pa)
        u(255, 1),              # 29    type of second surface (missing)
        u(255, 1),              # 30    scale factor (missing)
        u(0xFFFFFFFF, 4),       # 31-34 scaled value (missing)
    ])
    # ---- Section 5: Data representation, template 5.0 (21 octets) ----
    sec5 = b"".join([
        u(21, 4),                   # 1-4   section length
        u(5, 1),                    # 5     section number
        u(12, 4),                   # 6-9   number of packed points
        u(0, 2),                    # 10-11 data representation template 5.0
        struct.pack(">f", 270.0),   # 12-15 reference value R (IEEE f32)
        u(0x8005, 2),               # 16-17 E = -5 (sign-and-magnitude)
        u(0, 2),                    # 18-19 D = 0
        u(8, 1),                    # 20    bits per value
        u(0, 1),                    # 21    type of original values (float)
    ])
    # ---- Section 6: Bitmap (none) -------------------------------------
    sec6 = b"".join([
        u(6, 4),                # 1-4   section length
        u(6, 1),                # 5     section number
        u(255, 1),              # 6     bitmap indicator: none
    ])
    # ---- Section 7: Data -----------------------------------------------
    # codes X with v = R + X * 2^E  →  X = (v - 270.0) * 32 = 16 * k
    codes = bytes(16 * k for k in range(12))
    sec7 = b"".join([
        u(5 + len(codes), 4),   # 1-4   section length
        u(7, 1),                # 5     section number
        codes,                  # 6-    packed values (8-bit, byte aligned)
    ])
    payload = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(payload) + 4
    sec0 = b"".join([
        b"GRIB",                # 1-4   magic
        u(0, 2),                # 5-6   reserved
        u(0, 1),                # 7     discipline (meteorological)
        u(2, 1),                # 8     edition
        u(total, 8),            # 9-16  total message length
    ])
    return sec0 + payload + b"7777"


if __name__ == "__main__":
    import sys

    sys.stdout.buffer.write(assemble_golden())
