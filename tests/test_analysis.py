"""Analysis layer tests: histogram, parabola fit, pi0 kinematics
(reference test strategy: test/test_parabola.py)."""
import numpy as np

from chroma_tpu.histogram import Histogram, HistogramDD
from chroma_tpu.parabola import parabola_fit, parabola_eval, parabola_minimum
from chroma_tpu.ufloat import ufloat
from chroma_tpu import pi0


def test_histogram_fill_and_moments():
    h = Histogram(100, (-5, 5))
    np.random.seed(0)
    h.fill(np.random.normal(0, 1, 100000))
    assert abs(h.mean()) < 0.02
    assert abs(h.rms() - 1.0) < 0.02
    assert h.nentries > 99000
    # eval/interp at the center returns the peak bin
    assert h.eval(0.0) == h.hist[h.findbin(0.0)]
    h.normalize()
    widths = np.diff(h.bins)
    np.testing.assert_allclose((h.hist * widths).sum(), 1.0, rtol=1e-6)


def test_histogramdd():
    h = HistogramDD(bins=(10, 20), range=[(0, 1), (0, 2)])
    pts = np.random.uniform([0, 0], [1, 2], size=(10000, 2))
    h.fill(pts)
    assert h.hist.sum() == 10000
    val = h.eval([[0.5, 1.0]])
    assert val[0] > 0


def _quadratic_points(a, b, c, noise=0.01):
    "1-D parabola sample points with uncertainties."
    xs = np.linspace(-1, 1, 11)
    pts = []
    for x in xs:
        y = a + b * x + c * x * x
        pts.append((np.array([x]), ufloat(y, noise)))
    return pts


def test_parabola_fit_1d():
    pts = _quadratic_points(2.0, -1.0, 3.0)
    a, b, c, chi2, prob = parabola_fit(pts)
    assert abs(a.nominal_value - 2.0) < 1e-4
    assert abs(b[0].nominal_value - (-1.0)) < 1e-4
    assert abs(c[0, 0].nominal_value - 3.0) < 1e-4
    assert chi2 < 1e-6  # exact quadratic data
    # uncertainties are propagated (non-zero)
    assert a.std_dev() > 0

    # evaluation and minimum
    y = parabola_eval(np.array([0.5]), a, b, c)
    assert abs(y.nominal_value - (2.0 - 0.5 + 0.75)) < 1e-4
    xmin, fmin = parabola_minimum(a, b, c)
    assert abs(xmin[0] - (1.0 / 6.0)) < 1e-4


def test_parabola_fit_2d():
    np.random.seed(1)
    pts = []
    for x in np.linspace(-1, 1, 5):
        for y in np.linspace(-1, 1, 5):
            f = 1.0 + 2 * x - y + 0.5 * x * x + 0.25 * y * y + 0.1 * x * y
            pts.append((np.array([x, y]), ufloat(f, 0.01)))
    a, b, c, chi2, prob = parabola_fit(pts)
    assert abs(a.nominal_value - 1.0) < 1e-3
    assert abs(b[0].nominal_value - 2.0) < 1e-3
    assert abs(b[1].nominal_value + 1.0) < 1e-3
    assert abs(c[0, 0].nominal_value - 0.5) < 1e-3
    assert abs(c[1, 1].nominal_value - 0.25) < 1e-3
    # off-diagonal split across (i,j)/(j,i)
    assert abs(c[0, 1].nominal_value * 2 - 0.1) < 1e-3


def test_pi0_decay():
    # energy and momentum conservation in the lab frame
    e_pi0 = 500.0  # MeV
    direction = np.array([0.0, 0.0, 1.0])
    (e1, v1), (e2, v2) = pi0.pi0_decay(e_pi0, direction, theta=0.7,
                                       phi=1.1)
    assert abs((e1 + e2) - e_pi0) < 1e-6 * e_pi0
    p_total = e1 * v1 + e2 * v2
    p_expected = np.sqrt(e_pi0 ** 2 - pi0.PI0_MASS_MEV ** 2) * direction
    np.testing.assert_allclose(p_total, p_expected, atol=1e-6 * e_pi0)

    # invariant mass of the photon pair is the pi0 mass
    m2 = (e1 + e2) ** 2 - np.dot(e1 * v1 + e2 * v2, e1 * v1 + e2 * v2)
    assert abs(np.sqrt(m2) - pi0.PI0_MASS_MEV) < 1e-3
