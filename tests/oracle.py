"""Independent scalar numpy oracle of the reference integrator.

A from-scratch, recursive, one-ray-at-a-time implementation of the reference's
`Scene::castRay` semantics (src/Scene.cpp:85-184) written directly from the
math — deliberately structured like the C++ (recursion, per-ray RNG) and NOT
sharing any code with the vectorized mcpt_tpu implementation, so the two can
cross-validate statistically (the RNG streams differ; means must agree).

Used only by tests. Slow by construction.
"""

import numpy as np

EPS = 1e-4
WAVELEN = {0: 0.700, 1: 0.5461, 2: 0.4358}


def _normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v * 0.0


class OracleScene:
    """Flattened copy of a host Scene for brute-force scalar tracing."""

    def __init__(self, scene):
        tris = []
        for mesh in scene.meshes:
            for i in range(mesh.positions.shape[0]):
                tris.append(
                    (
                        mesh.positions[i, 0].astype(np.float64),
                        mesh.positions[i, 1].astype(np.float64),
                        mesh.positions[i, 2].astype(np.float64),
                        mesh.texcoords[i].astype(np.float64),
                        mesh.material,
                    )
                )
        self.tris = tris
        self.spheres = [
            (np.asarray(s.center, np.float64), float(s.radius), s.material)
            for s in scene.spheres
        ]
        self.emitters = [
            (v0, v1, v2, m)
            for (v0, v1, v2, uv, m) in tris
            if m.has_emission
        ]
        # Group emitter triangles by material-mesh (one mesh per material in
        # our test scenes); pdf is 1/mesh_area (see lights.py docstring).
        self.emit_areas = [
            0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0))
            for (v0, v1, v2, m) in self.emitters
        ]
        # Emissive spheres: uniform-area sampling, area 4πr² (lights.py
        # _sphere_point semantics).
        self.sphere_emitters = [
            (c, r, m) for (c, r, m) in self.spheres if m.has_emission
        ]
        self.sph_emit_areas = [
            4.0 * np.pi * r * r for (c, r, m) in self.sphere_emitters
        ]
        self.emit_total = float(
            np.sum(self.emit_areas) + np.sum(self.sph_emit_areas)
        )
        self.rr = scene.rr_rate
        self.inv_rr = 1.0 / scene.rr_rate
        self.n_dir = scene.n_dir_sample
        self.enable_shadow = scene.enable_shadow
        self.background = np.asarray(scene.background, np.float64)

    # -- intersection ------------------------------------------------------

    def intersect(self, o, d):
        """Nearest hit: (t, point, normal, uv, material, emissive) or None."""
        best = None
        for (v0, v1, v2, uvs, m) in self.tris:
            e1, e2 = v1 - v0, v2 - v0
            pvec = np.cross(d, e2)
            det = e1.dot(pvec)
            if abs(det) < EPS:
                continue
            inv = 1.0 / det
            tvec = o - v0
            u = tvec.dot(pvec) * inv
            if u < 0 or u > 1:
                continue
            qvec = np.cross(tvec, e1)
            v = d.dot(qvec) * inv
            if v < 0 or u + v > 1:
                continue
            t = e2.dot(qvec) * inv
            if t < 0:
                continue
            if best is None or t < best[0]:
                n = _normalize(np.cross(e1, e2))
                uv = (1 - u - v) * uvs[0] + u * uvs[1] + v * uvs[2]
                best = (t, o + t * d, n, uv, m, m.has_emission)
        for (c, r, m) in self.spheres:
            L = o - c
            a = d.dot(d)
            b = 2 * d.dot(L)
            cc = L.dot(L) - r * r
            disc = b * b - 4 * a * cc
            if disc < 0:
                continue
            sq = np.sqrt(disc)
            q = -0.5 * (b + sq) if b > 0 else -0.5 * (b - sq)
            t0, t1 = sorted((q / a, cc / q if q != 0 else np.inf))
            t = t0 if t0 >= 0 else t1
            if t < 0:
                continue
            if best is None or t < best[0]:
                p = o + t * d
                best = (t, p, _normalize(p - c), np.zeros(2), m, m.has_emission)
        return best

    # -- material math (scalar transcription of Material.hpp) --------------

    @staticmethod
    def ior(m, chan):
        wl = WAVELEN[chan]
        return m.ior_a + m.ior_b / (wl * wl)

    @staticmethod
    def d_ggx(h, n, alpha):
        noh = abs(n.dot(h))
        if noh <= EPS:
            return 0.0
        tan2 = (1 - noh * noh) / (noh * noh)
        denom = noh * noh * (alpha + tan2)
        return alpha * alpha / (np.pi * denom * denom)

    @staticmethod
    def g1(v, n, alpha):
        nov = abs(n.dot(v))
        if nov <= EPS:
            return 0.0
        tan_t = np.sqrt(max(1 - nov * nov, 0.0)) / nov
        if tan_t == 0:
            return 1.0
        at = alpha * tan_t
        return 2.0 / (1.0 + np.sqrt(1 + at * at))

    def reflectance(self, m, uv, chan):
        if not m.textured:
            return m.base_reflectance[chan]
        col = int((uv[0] - 0.05) * 10)
        row = int(uv[1] * 12)
        if 3 <= col <= 5 and row <= 7:
            return 0.9 if (col + row) % 2 == 1 else 0.1
        return 0.1

    def fresnel(self, m, I, n, chan):
        from mcpt_tpu.materials import MaterialType

        if m.mtype in (MaterialType.SMOOTH_CONDUCTOR, MaterialType.ROUGH_CONDUCTOR):
            return 1.0
        cosi = np.clip(I.dot(n), -1, 1)
        etai, etat = 1.0, self.ior(m, chan)
        if cosi > 0:
            etai, etat = etat, etai
        sint = etai / etat * np.sqrt(max(0.0, 1 - cosi * cosi))
        if sint >= 1:
            return 1.0
        cost = np.sqrt(max(0.0, 1 - sint * sint))
        cosi = abs(cosi)
        rs = (etat * cosi - etai * cost) / (etat * cosi + etai * cost)
        rp = (etai * cosi - etat * cost) / (etai * cosi + etat * cost)
        return 0.5 * (rs * rs + rp * rp)

    def refract(self, m, I, n, chan):
        cosi = np.clip(I.dot(n), -1, 1)
        etai, etat = 1.0, self.ior(m, chan)
        nn = n
        if cosi < 0:
            cosi = -cosi
        else:
            etai, etat = etat, etai
            nn = -n
        eta = etai / etat
        k = 1 - eta * eta * (1 - cosi * cosi)
        if k < 0:
            return np.zeros(3)
        return eta * I + (eta * cosi - np.sqrt(k)) * nn

    def sample_mfn(self, m, n, rng):
        from mcpt_tpu.materials import MaterialType

        if m.mtype in (MaterialType.SMOOTH_CONDUCTOR, MaterialType.SMOOTH_DIELECTRIC):
            return n
        x1, x2 = rng.random(), rng.random()
        alpha = m.roughness
        phi = 2 * np.pi * x1
        cos_t = np.sqrt((1 - x2) / (1 + (alpha * alpha - 1) * x2))
        sin_t = np.sqrt(max(1 - cos_t * cos_t, 0.0))
        th = np.array([sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t])
        if abs(n[0]) > abs(n[1]):
            il = 1.0 / np.sqrt(n[0] ** 2 + n[2] ** 2)
            T = np.array([-n[2] * il, 0.0, n[0] * il])
        else:
            il = 1.0 / np.sqrt(n[1] ** 2 + n[2] ** 2)
            T = np.array([0.0, n[2] * il, -n[1] * il])
        B = np.cross(n, T)
        return _normalize(th[0] * T + th[1] * B + th[2] * n)

    def pdf(self, m, wi, wo, n, chan, is_reflect):
        if m.is_dirac:
            if is_reflect:
                h = _normalize(wi + wo)
            else:
                ior = self.ior(m, chan)
                eta = ior if wi.dot(n) > 0 else 1.0 / ior
                h = _normalize(-wi - wo * eta)
                h = h if h.dot(n) > 0 else -h
            return 1.0 if abs(h.dot(n)) > 1 - EPS else 0.0
        if is_reflect:
            h = _normalize(wi + wo)
            h = h if wi.dot(n) > 0 else -h
            jac = 1.0 / (4.0 * abs(h.dot(wo)))
        else:
            ior = self.ior(m, chan)
            eta = ior if wi.dot(n) > 0 else 1.0 / ior
            hv = -wi - wo * eta
            h = _normalize(hv)
            jac = eta * eta * abs(h.dot(wo)) / hv.dot(hv)
        return self.d_ggx(h, n, m.roughness) * n.dot(h) * jac

    def eval(self, m, wi, wo, n, chan, uv, is_reflect):
        from mcpt_tpu.materials import MaterialType

        cond = m.mtype in (MaterialType.SMOOTH_CONDUCTOR, MaterialType.ROUGH_CONDUCTOR)
        if not m.is_dirac:
            if is_reflect:
                if wi.dot(n) * wo.dot(n) <= 0:
                    return 0.0
                h = _normalize(wi + wo)
                h = h if wi.dot(n) > 0 else -h
                F = (
                    self._schlick(abs(h.dot(wo)), self.reflectance(m, uv, chan))
                    if cond
                    else self.fresnel(m, -wi, h, chan)
                )
                D = self.d_ggx(h, n, m.roughness)
                G = self.g1(wi, h, m.roughness) * self.g1(wo, h, m.roughness)
                return F * D * G / (4 * abs(n.dot(wi)) * abs(n.dot(wo)) + EPS)
            else:
                if cond or wi.dot(n) * wo.dot(n) >= 0:
                    return 0.0
                ior = self.ior(m, chan)
                eta = ior if wi.dot(n) > 0 else 1.0 / ior
                h = _normalize(-wi - wo * eta)
                h = h if h.dot(n) > 0 else -h
                F = self.fresnel(m, -wi, h, chan)
                D = self.d_ggx(h, n, m.roughness)
                G = self.g1(wi, h, m.roughness) * self.g1(wo, h, m.roughness)
                hol, hov = h.dot(wi), h.dot(wo)
                den = (hol + eta * hov) ** 2 * abs(n.dot(wi) * n.dot(wo))
                return (1 - F) * D * G * eta * eta * abs(hol * hov) / den
        else:
            if is_reflect:
                h = _normalize(wi + wo)
                h = h if wi.dot(n) > 0 else -h
                if wi.dot(n) * wo.dot(n) <= 0 or h.dot(n) < 1 - EPS:
                    return 0.0
                return (
                    self._schlick(abs(n.dot(wo)), self.reflectance(m, uv, chan))
                    if cond
                    else self.fresnel(m, -wi, n, chan)
                )
            else:
                ior = self.ior(m, chan)
                eta = ior if wi.dot(n) > 0 else 1.0 / ior
                h = _normalize(-wi - wo * eta)
                h = h if h.dot(n) > 0 else -h
                if cond or wi.dot(n) * wo.dot(n) >= 0 or h.dot(n) < 1 - EPS:
                    return 0.0
                return 1.0 - self.fresnel(m, -wi, n, chan)

    @staticmethod
    def _schlick(cos_t, f0):
        return f0 + (1 - f0) * (1 - cos_t) ** 5

    # -- light sampling ----------------------------------------------------

    def sample_light(self, rng):
        p = rng.random() * self.emit_total
        acc = 0.0
        for (v0, v1, v2, m), a in zip(self.emitters, self.emit_areas):
            acc += a
            if p <= acc:
                x = np.sqrt(rng.random())
                y = rng.random()
                pos = v0 * (1 - x) + v1 * (x * (1 - y)) + v2 * (x * y)
                n = _normalize(np.cross(v1 - v0, v2 - v0))
                return pos, n, np.asarray(m.emission), 1.0 / self.emit_total
        for (c, r, m), a in zip(self.sphere_emitters, self.sph_emit_areas):
            acc += a
            if p <= acc:
                break
        else:
            if not self.sphere_emitters:
                v0, v1, v2, m = self.emitters[-1]
                return (
                    v0,
                    _normalize(np.cross(v1 - v0, v2 - v0)),
                    np.asarray(m.emission),
                    1.0 / self.emit_total,
                )
            c, r, m = self.sphere_emitters[-1]
        ys = 1.0 - 2.0 * rng.random()
        s = np.sqrt(max(1.0 - ys * ys, 0.0))
        ph = 2.0 * np.pi * rng.random()
        dv = np.array([s * np.cos(ph), ys, s * np.sin(ph)])
        return c + r * dv, dv, np.asarray(m.emission), 1.0 / self.emit_total

    def direct_lighting(self, wo, p, n, uv, m, chan, is_reflect, rng):
        l_dir = 0.0
        for _ in range(self.n_dir):
            pl, nl, emit, pdf = self.sample_light(rng)
            ws = _normalize(pl - p)
            dist = np.linalg.norm(pl - p)
            vis = True
            if self.enable_shadow:
                hit = self.intersect(p, ws)
                vis = hit is not None and abs(hit[0] - dist) < EPS
            if vis:
                l_dir += (
                    emit[chan]
                    * self.eval(m, ws, wo, n, chan, uv, is_reflect)
                    * ws.dot(n)
                    * (-ws).dot(nl)
                    / (dist * dist)
                    / pdf
                    / self.n_dir
                )
        return l_dir

    # -- the recursion -----------------------------------------------------

    def cast_ray(self, o, d, depth, chan, rng, max_depth=64):
        hit = self.intersect(o, d)
        if hit is None:
            return self.background[chan]
        t, p, n, uv, m, emissive = hit
        wo = -d
        if depth == 0 and emissive:
            return float(np.clip(np.asarray(m.emission)[chan] * abs(wo.dot(n)), 0, 1))
        mfn = self.sample_mfn(m, n, rng)
        kr = self.fresnel(m, d, mfn, chan)
        p_dl = p + n * EPS
        if wo.dot(n) < 0:
            l_dir = (1 - kr) * self.direct_lighting(wo, p_dl, n, uv, m, chan, False, rng)
        else:
            l_dir = kr * self.direct_lighting(wo, p_dl, n, uv, m, chan, True, rng)
        rr = rng.random()
        rd = rng.random()
        l_ind = 0.0
        if rd < kr:
            pp = p - n * EPS if wo.dot(mfn) < 0 else p + n * EPS
            if rr >= self.rr or depth >= max_depth:
                return l_dir
            wi = 2 * mfn.dot(wo) * mfn - wo
            nxt = self.intersect(pp, wi)
            if nxt is not None and not nxt[5]:
                L = self.cast_ray(pp, wi, depth + 1, chan, rng, max_depth)
                ev = self.eval(m, wi, wo, n, chan, uv, True)
                if m.is_dirac:
                    l_ind = L * ev * self.inv_rr
                else:
                    l_ind = L * ev * abs(wo.dot(n)) / self.pdf(m, wi, wo, n, chan, True) * self.inv_rr
            else:
                l_ind = self.background[chan] * self.eval(m, wi, wo, n, chan, uv, True) * self.inv_rr
        else:
            pp = p + n * EPS if wo.dot(mfn) < 0 else p - n * EPS
            if rr >= self.rr or depth >= max_depth:
                return l_dir
            wi = self.refract(m, d, mfn, chan)
            nxt = self.intersect(pp, wi)
            if nxt is not None and not nxt[5]:
                L = self.cast_ray(pp, wi, depth + 1, chan, rng, max_depth)
                ev = self.eval(m, wi, wo, n, chan, uv, False)
                if m.is_dirac:
                    l_ind = L * ev * self.inv_rr
                else:
                    l_ind = L * ev * abs(wo.dot(n)) / self.pdf(m, wi, wo, n, chan, False) * self.inv_rr
            else:
                l_ind = self.background[chan] * self.eval(m, wi, wo, n, chan, uv, False) * self.inv_rr
        return float(np.clip(l_dir, 0, 15) + np.clip(l_ind, 0, 5))
