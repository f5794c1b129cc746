"""Structural search for the exact htslib glocal-HMM variant: a
parameterized probaln with binary knobs, scored against the cov-1
constraint set extracted from the reference's samtools.pileup golden."""

import pickle
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

import sequila_spark.functions.baq as B
from baq_harness import FASTA

PM = []
PX = []
for q in range(256):
    qf = np.float32(10.0 ** (-q / 10.0))
    PM.append(1.0 - float(qf))
    PX.append(float(np.float32(qf * np.float32(0.33333333333))))


def probaln_var(R, Q, iq, knobs, d=1e-3, e=0.1, maxbw=7):
    l_ref, l_query = len(R), len(Q)
    if l_ref <= 0 or l_query <= 0:
        return [0] * l_query, [0] * l_query
    bw = max(l_ref, l_query)
    bw = min(bw, maxbw)
    bw = max(bw, abs(l_ref - l_query))
    bw2 = bw * 2 + 1
    width = bw2 * 3 + 6
    pm = [PM[x] for x in iq]
    px = [PX[x] for x in iq]
    f = [[0.0] * width for _ in range(l_query + 1)]
    b = [[0.0] * width for _ in range(l_query + 1)]
    s = [0.0] * (l_query + 2)
    sM = sI = 1.0 / (2 * l_query + 2)
    if knobs.get("sM_half"):
        sM = sI = 1.0 / (l_query + 1)
    m = [
        (1 - d - d) * (1 - sM), d * (1 - sM), d * (1 - sM),
        (1 - e) * (1 - sI), e * (1 - sI), 0.0,
        1 - e, 0.0, e,
    ]
    if knobs.get("dm_smooth"):  # D->M also smoothed by exit
        m[6] = (1 - e) * (1 - sM)
    bM = (1 - d) / l_ref
    bI = d / l_ref
    if knobs.get("entry_flat"):
        bM = 1 - d
        bI = d
    EI = 0.25

    def su(i, k):
        x = i - bw
        return (k - (x if x > 0 else 0) + 1) * 3

    f[0][su(0, 0)] = s[0] = 1.0
    fi = f[1]
    beg, end = 1, min(l_ref, bw + 1)
    ss = 0.0
    for k in range(beg, end + 1):
        ek = 1.0 if (R[k - 1] > 3 or Q[0] > 3) else (pm[0] if R[k - 1] == Q[0] else px[0])
        u = su(1, k)
        fi[u] = ek * bM
        if not knobs.get("no_I_entry"):
            fi[u + 1] = EI * bI
        ss += fi[u] + fi[u + 1]
    s[1] = ss
    for k in range(su(1, beg), su(1, end) + 3):
        fi[k] /= ss
    for i in range(2, l_query + 1):
        fi, fi1 = f[i], f[i - 1]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        ss = 0.0
        for k in range(beg, end + 1):
            ek = 1.0 if (R[k - 1] > 3 or Q[i - 1] > 3) else (
                pm[i - 1] if R[k - 1] == Q[i - 1] else px[i - 1]
            )
            u = su(i, k)
            v11 = su(i - 1, k - 1)
            v10 = su(i - 1, k)
            v01 = su(i, k - 1)
            fi[u] = ek * (m[0] * fi1[v11] + m[3] * fi1[v11 + 1] + m[6] * fi1[v11 + 2])
            fi[u + 1] = EI * (m[1] * fi1[v10] + m[4] * fi1[v10 + 1])
            fi[u + 2] = m[2] * fi[v01] + m[8] * fi[v01 + 2]
            ss += fi[u] + fi[u + 1] + fi[u + 2]
        s[i] = ss
        for k in range(su(i, beg), su(i, end) + 3):
            fi[k] /= ss
    ss = 0.0
    for k in range(1, l_ref + 1):
        u = su(l_query, k)
        if u < 3 or u >= bw2 * 3 + 3:
            continue
        ss += f[l_query][u] * sM + f[l_query][u + 1] * sI
        if knobs.get("exit_last_only") and k != l_ref:
            ss -= f[l_query][u] * sM + f[l_query][u + 1] * sI
    s[l_query + 1] = ss
    bi = b[l_query]
    for k in range(1, l_ref + 1):
        u = su(l_query, k)
        if u < 3 or u >= bw2 * 3 + 3:
            continue
        if knobs.get("exit_last_only") and k != l_ref:
            continue
        bi[u] = sM / s[l_query] / s[l_query + 1]
        bi[u + 1] = sI / s[l_query] / s[l_query + 1]
    for i in range(l_query - 1, 0, -1):
        bi, bi1 = b[i], b[i + 1]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        for k in range(end, beg - 1, -1):
            u = su(i, k)
            v11 = su(i + 1, k + 1)
            v10 = su(i + 1, k)
            v01 = su(i, k + 1)
            ek = 0.0 if k >= l_ref else (
                1.0 if (R[k] > 3 or Q[i] > 3) else (pm[i] if R[k] == Q[i] else px[i])
            ) * bi1[v11]
            bi[u] = ek * m[0] + EI * m[1] * bi1[v10 + 1] + m[2] * bi[v01 + 2]
            bi[u + 1] = ek * m[3] + EI * m[4] * bi1[v10 + 1]
            bi[u + 2] = ek * m[6] + m[8] * bi[v01 + 2]
        y = 1.0 / s[i]
        for k in range(su(i, beg), su(i, end) + 3):
            bi[k] *= y
    import math

    state = [0] * l_query
    q = [0] * l_query
    for i in range(1, l_query + 1):
        fi, bi = f[i], b[i]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        ss = 0.0
        mx = 0.0
        mk = -1
        for k in range(beg, end + 1):
            u = su(i, k)
            z = fi[u] * bi[u]
            if z > mx:
                mx, mk = z, (k - 1) << 2 | 0
            ss += z
            z = fi[u + 1] * bi[u + 1]
            if z > mx:
                mx, mk = z, (k - 1) << 2 | 1
            ss += z
            if knobs.get("post_incl_D"):
                ss += fi[u + 2] * bi[u + 2]
        mx /= ss
        state[i - 1] = mk
        if mx >= 1.0:
            q[i - 1] = 99
        else:
            kk = int(-4.343 * math.log(1.0 - mx) + 0.499)
            q[i - 1] = 99 if kk > 100 else kk
    return state, q


def caps_for(rd, knobs, contigs):
    ops = B._cigar_ops(rd["cigar"])
    if any(op == "N" for _, op in ops):
        return list(rd["iq"])
    x = rd["pos"] - 1
    y = 0
    xb = xe = yb = ye = -1
    for n, op in ops:
        if op in "M=X":
            if yb < 0:
                yb = y
            if xb < 0:
                xb = x
            ye = y + n
            xe = x + n
            x += n
            y += n
        elif op in "SI":
            y += n
        elif op == "D":
            x += n
    l = len(rd["seq"])
    bw = 7
    if abs((xe - xb) - (ye - yb)) > bw:
        bw = abs((xe - xb) - (ye - yb)) + 3
    xb -= yb + bw // 2
    if xb < 0:
        xb = 0
    xe += (l - ye) + bw // 2
    if xe - xb - l > bw:
        sh = (xe - xb - l - bw) // 2
        xb += sh
        xe -= sh
    ref = contigs[rd["contig"]]
    R = [B._code(c) for c in ref[max(xb, 0):xe]]
    Q = [B._code(c) for c in rd["seq"]]
    xb = max(xb, 0)
    state, q = probaln_var(R, Q, rd["iq"], knobs, maxbw=bw)
    bq = list(rd["iq"])
    x = rd["pos"] - 1
    y = 0
    for n, op in ops:
        if op in "M=X":
            t = [
                0 if (state[y + i] & 3) != 0 or (state[y + i] >> 2) != x - xb + i else q[y + i]
                for i in range(n)
            ]
            left = list(t)
            for i in range(1, n):
                if left[i - 1] > left[i]:
                    left[i] = left[i - 1]
            rg = list(t)
            for i in range(n - 2, -1, -1):
                if rg[i + 1] > rg[i]:
                    rg[i] = rg[i + 1]
            for i in range(n):
                c2 = min(left[i], rg[i])
                if c2 < bq[y + i]:
                    bq[y + i] = c2
            x += n
            y += n
        elif op in "SI":
            y += n
        elif op == "D":
            x += n
    return bq


def main():
    contigs = B._fasta_contigs(FASTA)
    data = pickle.load(open("/tmp/baq_cons.pkl", "rb"))
    knob_sets = [
        {},
        {"no_I_entry": 1},
        {"sM_half": 1},
        {"dm_smooth": 1},
        {"entry_flat": 1},
        {"post_incl_D": 1},
        {"exit_last_only": 1},
        {"no_I_entry": 1, "sM_half": 1},
        {"entry_flat": 1, "no_I_entry": 1},
    ]
    for knobs in knob_sets:
        bad = 0
        tot = 0
        for rd, cl in data:
            bq = caps_for(rd, knobs, contigs)
            for qi, g in cl:
                tot += 1
                if bq[qi] != g:
                    bad += 1
        print(f"{knobs}: bad={bad}/{tot}")


if __name__ == "__main__":
    main()
