"""NumPy port of the reference flatness forward map (flatness.hpp:54-134),
scalar, straight transcription of the equations for parity testing."""

import numpy as np


def forward(phys, vel, acc, jer, psi, dpsi):
    mass, grav = phys.vehicle_mass, phys.grav_acc
    dh, dv, cp, veps = (phys.horiz_drag, phys.vert_drag,
                        phys.parasitic_drag, phys.speed_smooth)

    v0, v1, v2 = vel
    a0, a1, a2 = acc
    cp_term = np.sqrt(v0 * v0 + v1 * v1 + v2 * v2 + veps)
    w_term = 1.0 + cp * cp_term
    w0, w1, w2 = w_term * v0, w_term * v1, w_term * v2
    dh_over_m = dh / mass
    zu0 = a0 + dh_over_m * w0
    zu1 = a1 + dh_over_m * w1
    zu2 = a2 + dh_over_m * w2 + grav
    zu_sqr0, zu_sqr1, zu_sqr2 = zu0 * zu0, zu1 * zu1, zu2 * zu2
    zu01, zu12, zu02 = zu0 * zu1, zu1 * zu2, zu0 * zu2
    zu_sqr_norm = zu_sqr0 + zu_sqr1 + zu_sqr2
    zu_norm = np.sqrt(zu_sqr_norm)
    z0, z1, z2 = zu0 / zu_norm, zu1 / zu_norm, zu2 / zu_norm
    ng_den = zu_sqr_norm * zu_norm
    ng00 = (zu_sqr1 + zu_sqr2) / ng_den
    ng01 = -zu01 / ng_den
    ng02 = -zu02 / ng_den
    ng11 = (zu_sqr0 + zu_sqr2) / ng_den
    ng12 = -zu12 / ng_den
    ng22 = (zu_sqr0 + zu_sqr1) / ng_den
    v_dot_a = v0 * a0 + v1 * a1 + v2 * a2
    dw_term = cp * v_dot_a / cp_term
    dw0 = w_term * a0 + dw_term * v0
    dw1 = w_term * a1 + dw_term * v1
    dw2 = w_term * a2 + dw_term * v2
    dz_t0 = jer[0] + dh_over_m * dw0
    dz_t1 = jer[1] + dh_over_m * dw1
    dz_t2 = jer[2] + dh_over_m * dw2
    dz0 = ng00 * dz_t0 + ng01 * dz_t1 + ng02 * dz_t2
    dz1 = ng01 * dz_t0 + ng11 * dz_t1 + ng12 * dz_t2
    dz2 = ng02 * dz_t0 + ng12 * dz_t1 + ng22 * dz_t2
    f0 = mass * a0 + dv * w0
    f1 = mass * a1 + dv * w1
    f2 = mass * (a2 + grav) + dv * w2
    thr = z0 * f0 + z1 * f1 + z2 * f2
    tilt_den = np.sqrt(2.0 * (1.0 + z2))
    tilt0 = 0.5 * tilt_den
    tilt1 = -z1 / tilt_den
    tilt2 = z0 / tilt_den
    ch, sh = np.cos(0.5 * psi), np.sin(0.5 * psi)
    quat = np.array([
        tilt0 * ch,
        tilt1 * ch + tilt2 * sh,
        tilt2 * ch - tilt1 * sh,
        tilt0 * sh,
    ])
    cpsi, spsi = np.cos(psi), np.sin(psi)
    omg_den = z2 + 1.0
    omg_term = dz2 / omg_den
    omg = np.array([
        dz0 * spsi - dz1 * cpsi - (z0 * spsi - z1 * cpsi) * omg_term,
        dz0 * cpsi + dz1 * spsi - (z0 * cpsi + z1 * spsi) * omg_term,
        (z1 * dz0 - z0 * dz1) / omg_den + dpsi,
    ])
    return thr, quat, omg
