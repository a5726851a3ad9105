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


class TestRunHealth:
    def test_stage_budget_and_divergence(self):
        from lidar_slam_tpu.utils.watchdog import RunHealth

        warns = []
        rh = RunHealth(stage_budget_ms=0.0, max_step_translation=1.0, log=warns.append)
        with rh.stage("track"):
            pass  # any duration > 0 ms budget -> miss
        assert rh.stages["track"].misses == 1
        assert warns and "track took" in warns[0]

        import numpy as np

        p0 = np.eye(4)
        p1 = np.eye(4)
        p1[:3, 3] = [5.0, 0, 0]
        assert rh.frame(p0)  # first frame: no step to judge
        assert not rh.frame(p1)  # 5 m jump > 1 m bound
        assert rh.divergences == 1
        s = rh.summary()
        assert s["frames"] == 2 and s["stages"]["track"]["calls"] == 1

    def test_stall_detection(self):
        import time

        from lidar_slam_tpu.utils.watchdog import RunHealth

        rh = RunHealth(stall_timeout_s=0.01)
        assert not rh.stalled()
        time.sleep(0.02)
        assert rh.stalled()
