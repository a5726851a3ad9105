import time

import numpy as np

from lidar_slam_tpu.utils import TicToc, StageTimer, StreamingMedian


class TestStreamingMedian:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        vals = rng.normal(size=101)
        sm = StreamingMedian()
        for v in vals:
            sm.insert(float(v))
        assert abs(sm.median() - np.median(vals)) < 1e-12
        assert len(sm) == 101

    def test_even_count_average(self):
        sm = StreamingMedian()
        for v in [1.0, 2.0, 3.0, 4.0]:
            sm.insert(v)
        assert sm.median() == 2.5


class TestTimers:
    def test_tictoc(self):
        t = TicToc()
        time.sleep(0.01)
        ms = t.toc()
        assert 5 < ms < 500

    def test_stage_timer(self):
        st = StageTimer()
        with st.stage("a"):
            time.sleep(0.005)
        with st.stage("a"):
            time.sleep(0.005)
        with st.stage("b"):
            pass
        s = st.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["mean_ms"] > 2
        assert "a" in st.report()
