#!/usr/bin/env python3
"""One-time extraction of ICD-mandated constant tables into .npz data files.

The GNSS spreading codes are defined by public Interface Control Documents
(IS-GPS-200/705, Galileo OS SIS ICD, BDS ICDs).  The per-PRN constants
(register initial states, Weil-code phase/truncation points, secondary-code
hex strings, Galileo E1 memory codes) are *data*, not algorithms.  This tool
parses them out of the reference MATLAB tree (or any copy of the ICD tables in
the same layout) and stores them as packed numpy archives under
``cusdr_tpu/signals/codes/data/``.  All code *generation algorithms* in this
repo are implemented independently against the ICD semantics.

Usage:  python tools/extract_icd_tables.py [REF_ROOT]
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).resolve().parent.parent / "cusdr_tpu/signals/codes/data"
OUT.mkdir(parents=True, exist_ok=True)


def strip_matlab(text: str) -> str:
    """Remove MATLAB comments (both %... and continuation ellipses)."""
    out_lines = []
    for line in text.splitlines():
        # '...' starts a continuation; anything after it is a comment
        if "..." in line:
            line = line.split("...")[0] + " "
        # strip % comments (not inside quotes for our tables)
        line = re.sub(r"%.*$", "", line)
        out_lines.append(line)
    return "\n".join(out_lines)


def matlab_array(path: Path, name: str):
    """Extract tokens of `name = [ ... ];` from a MATLAB file."""
    text = strip_matlab(path.read_text(errors="replace"))
    m = re.search(re.escape(name) + r"\s*=\s*\[(.*?)\]\s*;", text, re.S)
    if m is None:
        raise ValueError(f"{name} not found in {path}")
    return m.group(1)


def numeric_table(path: Path, name: str, dtype=np.int64):
    body = matlab_array(path, name)
    # expand repmat([v], 1, n) -> v repeated n times
    body = re.sub(
        r"repmat\(\s*\[?\s*(-?\d+)\s*\]?\s*,\s*1\s*,\s*(\d+)\s*\)",
        lambda m: " ".join([m.group(1)] * int(m.group(2))), body)
    rows = [r for r in re.split(r"[;\n]", body)]
    vals = []
    nrows = 0
    for r in rows:
        toks = re.findall(r"-?\d+", r)
        if toks:
            vals.append([int(t) for t in toks])
            nrows += 1
    if all(len(v) == len(vals[0]) for v in vals) and nrows > 1 \
            and len(vals[0]) > 1:
        return np.asarray(vals, dtype=dtype)
    return np.asarray([x for v in vals for x in v], dtype=dtype)


def octal_string_table(path: Path, name: str):
    """Tables written as numeric literals that are octal (keep leading zeros
    by re-reading raw tokens as strings)."""
    body = matlab_array(path, name)
    toks = re.findall(r"\d+", body)
    return np.asarray([int(t, 8) for t in toks], dtype=np.uint64)


def quoted_string_table(path: Path, name: str):
    body = matlab_array(path, name)
    return re.findall(r"'([0-9A-Fa-f]+)'", body)


def save(fname, **arrays):
    np.savez_compressed(OUT / fname, **arrays)
    print(f"wrote {OUT / fname}:", {k: getattr(v, 'shape', len(v))
                                    for k, v in arrays.items()})


# --- GPS L2C (IS-GPS-200 initial states, octal) ----------------------------
p = REF / "GPS/GPS_L2C/include/generateL2Ccode.m"
save("gps_l2c.npz",
     cm_init=octal_string_table(p, "l2cm_init"),
     cl_init=octal_string_table(p, "l2cl_init"))

# --- GPS L5 (IS-GPS-705 XB code advances) ----------------------------------
save("gps_l5.npz",
     i_advance=numeric_table(REF / "GPS/GPS_L5C/include/generateL5Icode.m",
                             "l5i_init"),
     q_advance=numeric_table(REF / "GPS/GPS_L5C/include/generateL5Qcode.m",
                             "l5q_init"))

# --- Galileo E5 (OS SIS ICD register-2 start values, octal strings) --------
def e5(path, name):
    return np.asarray([int(s, 8) for s in quoted_string_table(path, name)],
                      dtype=np.uint32)

save("gal_e5.npz",
     e5ai_init=e5(REF / "GAL/GAL_E5a/include/generateE5aIcode.m", "e5ai_init"),
     e5aq_init=e5(REF / "GAL/GAL_E5a/include/generateE5aQcode.m", "e5aq_init"),
     e5bi_init=e5(REF / "GAL/GAL_E5b/include/generateE5bIcode.m", "e5bi_init2"),
     e5bq_init=e5(REF / "GAL/GAL_E5b/include/generateE5bQcode.m", "e5bq_init2"),
     e5aq_sec=np.asarray(quoted_string_table(
         REF / "GAL/GAL_E5a/include/generateE5aQ_secondary.m",
         "secondary_code")),
     e5bq_sec=np.asarray(quoted_string_table(
         REF / "GAL/GAL_E5b/include/generateE5bQ_secondary.m",
         "secondary_code")))

# --- Galileo E1 memory codes (OS SIS ICD Annex C) --------------------------
def memcode(fname):
    raw = np.fromstring((REF / f"GAL/GAL_E1C/include/{fname}").read_text(),
                        dtype=np.uint8, sep="\n") \
        if False else np.loadtxt(REF / f"GAL/GAL_E1C/include/{fname}",
                                 dtype=np.uint8)
    assert raw.size == 4092 * 50, raw.size
    return np.packbits(raw.reshape(50, 4092), axis=1)

save("gal_e1.npz", e1b=memcode("E1b.dat"), e1c=memcode("E1c.dat"))

# --- BDS B1C Weil phase/truncation tables (BDS-SIS-ICD-B1C) ----------------
save("bds_b1c.npz",
     data_wp=numeric_table(REF / "BDS/B1C/include/generateDataBOC11.m",
                           "wp_data"),
     pilot_wp=numeric_table(REF / "BDS/B1C/include/generatePilotBOC11.m",
                            "wp_pilot"),
     sec_wp=numeric_table(REF / "BDS/B1C/include/generate2ndCode.m",
                          "wp_pilot"))

# --- BDS B1I G2 phase assignments (BDS-SIS-ICD-B1I) ------------------------
p53 = REF / "BDS/B1I/include/generateCAcode53.m"
save("bds_b1i.npz",
     g2s1=numeric_table(p53, "g2s1"),
     g2s2=numeric_table(p53, "g2s2"),
     g2s3=numeric_table(p53, "g2s3"))

# --- BDS B3I initial states -------------------------------------------------
save("bds_b3i.npz",
     cb_init=numeric_table(REF / "BDS/B3I/include/generateB3Icode.m",
                           "B3I_init"))

# --- BDS B2a register-2 initial bit vectors --------------------------------
save("bds_b2a.npz",
     data_reg2=numeric_table(
         REF / "BDS/B2a/include/generateB2aDataCode.m",
         "B2aData_reg2_ini", dtype=np.uint8),
     pilot_reg2=numeric_table(
         REF / "BDS/B2a/include/generateB2aPilotCode.m",
         "B2aData_reg2_ini", dtype=np.uint8))

print("done")
