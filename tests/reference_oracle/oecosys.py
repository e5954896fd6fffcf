"""Independent NumPy oracle for the native BGC interior tendency.

MARBL itself is not in the reference tree (Externals_POP.cfg pins the
external marbl0.43.0 repo; zero-egress images cannot fetch it), so unlike
okpp/ogm/osubmeso this cannot be a transliteration of reference Fortran.
Instead it is an INDEPENDENT re-derivation of the documented equation set
of pop2_tpu.ecosys (the BEC formulation of Moore et al. 2004 with the
MARBL-parity extensions: variable P and Fe quotas, denitrification,
explicit ligand, refractory DOM, sediment burial): one column at a time,
plain Python floats and explicit k loops — no shared code, no shared
vectorization — so that indexing/broadcast/scan errors in the whole-field
jnp implementation cannot cancel against themselves.
"""

import numpy as np

from pop2_tpu import ecosys as E

IDX = E.IDX
NT = len(E.TRACER_NAMES)


def _sink_remin_col(prod, dz, kmt, length, bury=None, ht=None):
    """Column sinking/remin: explicit downward loop (cf. E._sink_remin)."""
    km = len(dz)
    remin = np.zeros(km)
    f_top = 0.0
    for k in range(km):
        if k >= kmt:
            break
        f_avail = f_top + prod[k] * dz[k]
        at_bottom = (k + 1) == kmt
        if bury is None:
            bfrac = 0.0
        elif bury == "dunne":
            fday = f_avail * E.FLUX_TO_MMOL_M2_DAY
            bfrac = 0.013 + 0.53 * fday ** 2 / (7.0 + fday) ** 2
        elif bury == "caco3":
            bfrac = 1.0 if ht < E.CACO3_BURY_THRES else 0.0
        else:
            bfrac = float(bury)
        bflux = f_avail * bfrac if at_bottom else 0.0
        f_bot = 0.0 if at_bottom else f_avail * np.exp(-dz[k] / length)
        remin[k] = (f_avail - f_bot - bflux) / dz[k]
        f_top = f_bot
    return remin


def interior_column(tr, temp, qsw_wm2, dz, kmt, ht, lburial=True):
    """Interior tendency for ONE column.

    tr: (NT, km) non-negative ecosystem tracers; temp: (km) degC;
    qsw_wm2: surface shortwave (W/m^2); dz: (km) cm; kmt: ocean levels;
    ht: column depth (cm). Returns (NT, km) sources (mmol/m^3/s etc.)."""
    km = len(dz)
    g = lambda n: np.maximum(tr[IDX[n]], 0.0)       # noqa: E731
    t = {n: g(n) for n in E.TRACER_NAMES}
    src = {n: np.zeros(km) for n in E.TRACER_NAMES}
    SPD = E.SPD

    tfunc = E.Q10 ** ((temp - E.TREF) / 10.0)

    # light at layer centers
    par = np.zeros(km)
    att = 0.0
    for k in range(km):
        chl = t["spChl"][k] + t["diatChl"][k] + t["diazChl"][k]
        katt = (E.K_W + E.K_CHL * chl) * dz[k]
        par[k] = E.PAR_FRAC * max(qsw_wm2, 0.0) * np.exp(-(att + 0.5 * katt))
        att += katt

    classes = ("sp", "diat", "diaz")
    rates = {}
    qfe = {}
    for p in classes:
        c = t[p + "C"]
        chl = t[p + "Chl"]
        theta = chl / np.maximum(c * E.Q_N_C, 1e-10)
        pc_max = E.PC_REF[p] / SPD * tfunc
        if p == "diaz":
            n_lim = np.ones(km)
            w_no3 = w_nh4 = np.zeros(km)
        else:
            den = 1.0 + t["NO3"] / E.K_NO3[p] + t["NH4"] / E.K_NH4[p]
            w_no3 = (t["NO3"] / E.K_NO3[p]) / den
            w_nh4 = (t["NH4"] / E.K_NH4[p]) / den
            n_lim = w_no3 + w_nh4
        p_lim = t["PO4"] / (t["PO4"] + E.K_PO4[p])
        fe_lim = t["Fe"] / (t["Fe"] + E.K_FE[p])
        nut = np.minimum(np.minimum(n_lim, p_lim), fe_lim)
        if p == "diat":
            nut = np.minimum(nut, t["SiO3"] / (t["SiO3"] + E.K_SIO3))
        pcm = np.maximum(pc_max * nut, 1e-12)
        theta_c = chl / np.maximum(c, 1e-10)
        l_lim = 1.0 - np.exp(-E.ALPHA_PI / SPD * theta_c * par / pcm)
        mu = pc_max * nut * l_lim
        photo_c = mu * c
        if p == "diaz":
            no3_up = nh4_up = np.zeros(km)
        else:
            tot = np.maximum(w_no3 + w_nh4, 1e-12)
            no3_up = photo_c * E.Q_N_C * w_no3 / tot
            nh4_up = photo_c * E.Q_N_C * w_nh4 / tot
        rho_chl = E.THETA_N_MAX[p] * np.minimum(
            1.0, mu / np.maximum(
                E.ALPHA_PI / SPD * theta * E.Q_N_C * par
                / np.maximum(c * E.Q_N_C, 1e-10), 1e-10))
        photo_chl = rho_chl * photo_c * E.Q_N_C
        graze = (E.GRAZE_MAX[p] / SPD * tfunc * t["zooC"]
                 * c ** 2 / (c ** 2 + E.K_GRAZE ** 2))
        loss = E.MORT / SPD * tfunc * c
        agg = E.AGG_RATE / SPD * c ** 2
        qfe[p] = (E.GQFE_MIN[p]
                  + (E.GQFE_0[p] - E.GQFE_MIN[p]) * fe_lim)
        rates[p] = dict(photo_c=photo_c, no3_up=no3_up, nh4_up=nh4_up,
                        graze=graze, loss=loss, agg=agg,
                        photo_chl=photo_chl)

    tot_photo = sum(r["photo_c"] for r in rates.values())
    tot_graze = sum(r["graze"] for r in rates.values())
    tot_loss = sum(r["loss"] for r in rates.values())
    tot_agg = sum(r["agg"] for r in rates.values())

    gqp = np.clip(E.PQ_INT + E.PQ_SLOPE * t["PO4"], E.PQ_MIN, E.PQ_MAX)
    qp = {}
    for p, r in rates.items():
        cinv = 1.0 / np.maximum(t[p + "C"], 1e-10)
        qp[p] = t[p + "P"] * cinv
        losses = r["graze"] + r["loss"] + r["agg"]
        src[p + "C"] += r["photo_c"] - losses
        src[p + "Chl"] += r["photo_chl"] - losses * t[p + "Chl"] * cinv
        src[p + "Fe"] += (r["photo_c"] * qfe[p]
                          - losses * t[p + "Fe"] * cinv)
        src[p + "P"] += r["photo_c"] * gqp - losses * t[p + "P"] * cinv
    dtl = (rates["diat"]["graze"] + rates["diat"]["loss"]
           + rates["diat"]["agg"])
    src["diatSi"] += (rates["diat"]["photo_c"] * E.Q_SI_C
                      - dtl * t["diatSi"] / np.maximum(t["diatC"], 1e-10))
    caco3_prod = E.CACO3_FRAC * rates["sp"]["photo_c"]
    sp_losses = (rates["sp"]["graze"] + rates["sp"]["loss"]
                 + rates["sp"]["agg"])
    sp_caco3_loss = sp_losses * t["spCaCO3"] / np.maximum(t["spC"], 1e-10)
    src["spCaCO3"] += caco3_prod - sp_caco3_loss

    z_loss = E.Z_MORT / SPD * tfunc * t["zooC"]
    z_loss2 = E.Z_MORT2 / SPD * t["zooC"] ** 2
    src["zooC"] += E.GRAZE_EFF * tot_graze - z_loss - z_loss2

    poc_prod = (E.GRAZE_POC * tot_graze + tot_agg + z_loss2
                + 0.5 * tot_loss)
    doc_prod = E.GRAZE_DOC * tot_graze + 0.5 * tot_loss + z_loss
    resp = (1.0 - E.GRAZE_EFF - E.GRAZE_POC - E.GRAZE_DOC) * tot_graze

    o2_lim = t["O2"] / (t["O2"] + E.O2_MIN)
    b_poc = "dunne" if lburial else None
    b_caco3 = "caco3" if lburial else None
    b_si = E.SI_BURY_FRAC if lburial else None
    poc_remin = _sink_remin_col(poc_prod, dz, kmt, E.POC_LENGTH, b_poc)
    caco3_remin = _sink_remin_col(sp_caco3_loss, dz, kmt, E.CACO3_LENGTH,
                                  b_caco3, ht=ht)
    si_sink = dtl * t["diatSi"] / np.maximum(t["diatC"], 1e-10)
    si_remin = _sink_remin_col(si_sink, dz, kmt, E.SI_LENGTH, b_si)
    fe_sink = sum((rates[p]["graze"] + rates[p]["loss"] + rates[p]["agg"])
                  * t[p + "Fe"] / np.maximum(t[p + "C"], 1e-10)
                  for p in classes)
    fe_remin = _sink_remin_col(fe_sink, dz, kmt, E.POC_LENGTH)

    dom_remin = E.DOM_REMIN / SPD * tfunc * o2_lim
    doc_remin = dom_remin * t["DOC"]
    don_remin = dom_remin * t["DON"]
    dop_remin = dom_remin * t["DOP"]

    docr_prod = E.DOCR_FRAC * doc_prod
    docr_remin = E.DOCR_REMIN / SPD * t["DOCr"]
    donr_prod = E.DOCR_FRAC * E.Q_N_C * doc_prod
    donr_remin = E.DOCR_REMIN / SPD * t["DONr"]
    src["DOC"] += doc_prod - docr_prod - doc_remin
    src["DOCr"] += docr_prod - docr_remin
    src["DON"] += E.Q_N_C * doc_prod - donr_prod - don_remin
    src["DONr"] += donr_prod - donr_remin

    resp_frac = 1.0 - E.GRAZE_EFF - E.GRAZE_POC - E.GRAZE_DOC
    sinkp_prod = (sum((E.GRAZE_POC * rates[p]["graze"] + rates[p]["agg"]
                       + 0.5 * rates[p]["loss"]) * qp[p] for p in classes)
                  + z_loss2 * E.Q_P_C)
    dop_prod = (sum((E.GRAZE_DOC * rates[p]["graze"]
                     + 0.5 * rates[p]["loss"]) * qp[p] for p in classes)
                + z_loss * E.Q_P_C)
    po4_direct = sum(
        (resp_frac * rates[p]["graze"]) * qp[p]
        + E.GRAZE_EFF * rates[p]["graze"] * (qp[p] - E.Q_P_C)
        for p in classes)
    dopr_prod = E.DOCR_FRAC * dop_prod
    dopr_remin = E.DOCR_REMIN / SPD * t["DOPr"]
    src["DOP"] += dop_prod - dopr_prod - dop_remin
    src["DOPr"] += dopr_prod - dopr_remin
    p_remin = _sink_remin_col(sinkp_prod, dz, kmt, E.POC_LENGTH,
                              "dunne" if lburial else None)

    nitrif = np.where(par < E.PAR_NITRIF,
                      E.NITRIF_RATE / SPD * t["NH4"], 0.0)
    remin_c = poc_remin + doc_remin + resp + docr_remin
    denit_c = (remin_c * (1.0 - o2_lim)
               * t["NO3"] / (t["NO3"] + E.K_NO3_DENIT))
    denit_no3 = denit_c / E.DENITRIF_C_N
    src["NH4"] += (E.Q_N_C * (poc_remin + resp) + don_remin + donr_remin
                   - sum(r["nh4_up"] for r in rates.values()) - nitrif)
    src["NO3"] += (nitrif - denit_no3
                   - sum(r["no3_up"] for r in rates.values()))
    src["PO4"] += (p_remin + dop_remin + dopr_remin + po4_direct
                   - sum(rates[p]["photo_c"] for p in classes) * gqp)
    src["SiO3"] += si_remin - rates["diat"]["photo_c"] * E.Q_SI_C

    fe_free = np.maximum(t["Fe"] - t["Lig"], 0.0)
    fe_bound = t["Fe"] - fe_free
    scav = (E.FE_SCAVENGE / SPD * fe_bound
            * (1.0 + E.FE_MAX_SCALE * np.minimum(t["Fe"], 2.0) / 2.0)
            + E.FE_FREE_SCAV / SPD * fe_free)
    src["Fe"] += (fe_remin - scav
                  - sum(rates[p]["photo_c"] * qfe[p] for p in classes))
    src["Lig"] += (E.LIG_PER_C * remin_c
                   - E.LIG_PHOTODEG / SPD * (par / E.PAR_LIG) * t["Lig"])

    src["O2"] += E.O2_PER_C * (tot_photo - remin_c * o2_lim)
    src["DIC"] += remin_c - tot_photo - caco3_prod + caco3_remin
    src["ALK"] += (sum(r["no3_up"] for r in rates.values())
                   - sum(r["nh4_up"] for r in rates.values())
                   - 2.0 * nitrif + denit_no3
                   - 2.0 * (caco3_prod - caco3_remin))
    src["DIC_ALT_CO2"] += src["DIC"]
    src["ALK_ALT_CO2"] += src["ALK"]

    out = np.stack([src[n] for n in E.TRACER_NAMES])
    for k in range(kmt, km):
        out[:, k] = 0.0
    return out
