#!/usr/bin/env python3
"""Replication-invariance check for the 10x corpus' quadratic-oracle
queries (the ones oracle_check_timeout SKIPs).

The 10x corpus replicates sf0.1 documents with every token suffixed
"_c<copy>" and doc_ids offset by copy*1e6: copies are token-DISJOINT,
and exact Jaccard/SimHash/edit-distance/substring relations are
invariant under consistent token renaming. So for any per-pair or
per-doc operator with no global statistics, the 10x answer must be
EXACTLY the sf0.1 answer replicated 10x with ids offset — a full
content check that costs O(answer), not O(n^2).

(LSH candidate generation is randomized by token hashes, so a copy
could in principle miss a band collision the original hit; at the
j>=0.95 verify threshold the 16-band/8-row miss probability is ~2e-10
per pair — treated as impossible.)

Usage: python3 tools/check_replication.py <sf01OutDir> <tenxOutDir> q1,q2,...
"""
import sys, glob, os
import pandas as pd

COPIES = 10
OFF = 1_000_000

ID_COLS = {"id_a", "id_b", "doc_id", "doc_a", "doc_b", "rep", "rep_id",
           "keep_id", "dup_id", "contained_id", "container_id"}

def load(out_dir, name):
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files])

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def replicate_generic(base, c):
    r = base.copy()
    for col in [x for x in base.columns if x in ID_COLS]:
        r[col] = r[col] + c * OFF
    return r

def replicate_components(base, c):
    # component_id/max_id are member doc_ids (offset); id_sum is a SUM
    # over n_members member ids, so it shifts by n_members*c*OFF
    r = base.copy()
    r["component_id"] = r["component_id"] + c * OFF
    r["max_id"] = r["max_id"] + c * OFF
    r["id_sum"] = r["id_sum"] + r["n_members"] * c * OFF
    return r

REPLICATORS = {
    # dedup_components goes through COPY0_SLICE below, but keep its
    # replicator registered for callers that bypass the slice check.
    "dedup_components_full": replicate_components,
}

# Queries whose output is a GLOBAL aggregate over the dedup clusters.
# Exact 10x scaling is NOT the right expectation: the builder's token
# suffixes change n_chars, which shifts the (lang, size-bucket)
# blocking of the underlying components in copies 1..9 (the same
# reason dedup_components uses the copy-0-slice check) — so copies
# 1..9 each keep k' docs with k' ≠ base in general, while copy 0
# (byte-identical) keeps exactly the base count. Sound invariant:
# kept_10x = base + 9·k' for an integral k' near base. Char-sum
# columns are dropped (suffixes lengthen text).
AGG_COPYSHARE = {
    # resolve = per-lang kept-corpus summary: 5 rows at any scale
    "dedup_resolve": (["lang"], "n_kept"),
}

# Blocked operators key their candidate generation on n_chars-derived
# buckets, and the corpus builder's token suffixes CHANGE n_chars for
# copies >= 1 — so full replication-equality is the wrong expectation.
# The sound check: (a) the copy-0 slice (byte-identical data; cross-
# copy edges impossible at jaccard 0 < threshold) must EXACTLY equal
# the oracle-checked sf0.1 answer, and (b) copies 1..9 must be
# mutually identical (every suffix is 3 chars, so they shift n_chars
# identically).
COPY0_SLICE = {"dedup_components": "component_id"}

# Pair queries where CROSS-copy pairs are legitimate output: copies
# 1..9 differ from each other only in the copy DIGIT of every token
# suffix, so two replicas of the same doc are a few character
# substitutions apart — a genuine edit-distance near-dup by the
# operator's own semantics (the sampled-slice full oracle confirms
# them). The sound invariance is on the WITHIN-copy slices: copy 0
# (byte-identical data) must equal the sf0.1 answer exactly, and
# copies 1..9 must be mutually identical after id de-offsetting
# (every suffix is the same length, so distances and ratios shift
# identically). Cross-copy pairs are counted and reported, not
# compared.
PAIR_COPY_SLICE = {"dedup_edit_distance": ("id_a", "id_b")}

def main():
    base_dir, tenx_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    n_pass = n_fail = 0
    for name in names:
        base, tenx = load(base_dir, name), load(tenx_dir, name)
        if base is None or tenx is None:
            print(f"FAIL {name}: missing output ({'sf0.1' if base is None else '10x'})")
            n_fail += 1; continue
        if name in COPY0_SLICE:
            key = COPY0_SLICE[name]
            ok = True
            c0 = canon(tenx[tenx[key] < OFF])
            if not canon(base).equals(c0):
                print(f"FAIL {name}: copy-0 slice != sf0.1 answer "
                      f"({len(c0)} vs {len(base)} rows)")
                n_fail += 1; continue
            first = None
            for c in range(1, COPIES):
                s = tenx[(tenx[key] >= c * OFF) & (tenx[key] < (c + 1) * OFF)].copy()
                for col in s.columns:
                    if col in ID_COLS or col in ("component_id", "max_id") or col == key:
                        s[col] = s[col] - c * OFF
                if "id_sum" in s.columns and "n_members" in s.columns:
                    s["id_sum"] = s["id_sum"] - s["n_members"] * c * OFF
                s = canon(s)
                if first is None:
                    first = s
                elif not first.equals(s):
                    print(f"FAIL {name}: copy {c} differs from copy 1")
                    ok = False; break
            if ok:
                print(f"PASS {name} (copy-0 slice == sf0.1 answer "
                      f"[{len(base)} rows]; copies 1..{COPIES-1} mutually identical "
                      f"[{len(first)} rows each])")
                n_pass += 1
            else:
                n_fail += 1
            continue
        if name in AGG_COPYSHARE:
            keys, cnt = AGG_COPYSHARE[name]
            try:
                m = base[keys + [cnt]].merge(
                    tenx[keys + [cnt]], on=keys, suffixes=("_base", "_10x"))
            except KeyError as e:
                print(f"FAIL {name}: expected columns missing: {e}")
                n_fail += 1; continue
            ok = len(m) == len(base)
            shares = []
            for _, r in m.iterrows():
                extra = r[f"{cnt}_10x"] - r[f"{cnt}_base"]
                if extra < 0 or extra % (COPIES - 1) != 0:
                    ok = False; break
                k = extra // (COPIES - 1)
                shares.append(int(k))
                # suffix-shifted blocking moves k' a little, not a lot
                if not (0.8 * r[f"{cnt}_base"] <= k <= 1.25 * r[f"{cnt}_base"]):
                    ok = False; break
            if ok:
                print(f"PASS {name} (copy-0 share == sf0.1 {cnt}; copies 1..{COPIES-1} "
                      f"each keep {shares} — equal integral shares within 25% of base)")
                n_pass += 1
            else:
                print(f"FAIL {name}: copy-share invariant broken "
                      f"(base+9k' decomposition failed)")
                n_fail += 1
            continue
        if name in PAIR_COPY_SLICE:
            ia, ib = PAIR_COPY_SLICE[name]
            within = tenx[(tenx[ia] // OFF) == (tenx[ib] // OFF)]
            cross = len(tenx) - len(within)
            c0 = canon(within[within[ia] < OFF])
            if not canon(base).equals(c0):
                print(f"FAIL {name}: copy-0 slice != sf0.1 answer "
                      f"({len(c0)} vs {len(base)} rows)")
                n_fail += 1; continue
            first = None; ok = True
            for c in range(1, COPIES):
                s = within[(within[ia] >= c * OFF) & (within[ia] < (c + 1) * OFF)].copy()
                s[ia] = s[ia] - c * OFF
                s[ib] = s[ib] - c * OFF
                s = canon(s)
                if first is None:
                    first = s
                elif not first.equals(s):
                    print(f"FAIL {name}: copy {c} within-slice differs from copy 1")
                    ok = False; break
            if ok:
                print(f"PASS {name} (copy-0 slice == sf0.1 answer [{len(base)} rows]; "
                      f"copies 1..{COPIES-1} mutually identical [{len(first)} rows each]; "
                      f"{cross} legitimate cross-copy replica pairs)")
                n_pass += 1
            else:
                n_fail += 1
            continue
        rep = REPLICATORS.get(name, replicate_generic)
        if rep is replicate_generic and not any(c in ID_COLS for c in base.columns):
            print(f"FAIL {name}: no id columns recognized in {list(base.columns)}")
            n_fail += 1; continue
        want = canon(pd.concat([rep(base, c) for c in range(COPIES)]))
        try:
            got = canon(tenx[want.columns.tolist()] if set(want.columns) != set(tenx.columns)
                        else tenx)
        except KeyError as e:
            print(f"FAIL {name}: expected columns missing from 10x output: {e}")
            n_fail += 1; continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows 10x={len(got)} expected={len(want)} (= 10 x {len(base)})")
            n_fail += 1; continue
        eq = True
        for col in want.columns:
            a, b = got[col].values, want[col].values
            neq = (pd.Series(a).astype(str) != pd.Series(b).astype(str)).values
            if neq.any():
                i = int(neq.argmax())
                print(f"FAIL {name}: col {col} row {i}: {a[i]} vs {b[i]}")
                eq = False; break
        if eq:
            print(f"PASS {name} ({len(got)} rows = 10 x {len(base)})")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
