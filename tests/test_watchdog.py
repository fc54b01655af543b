"""StallWatchdog: pure stall arithmetic + thread wrapper + loop wiring.

Motivated by an observed failure mode on the tunneled TPU backend: a
single process's device connection wedges (blocking dispatch never
returns, no exception) while fresh connections keep working — training
hangs silently. The watchdog warns; it must never false-positive during
long compiles or kill anything.
"""

import time

from infinite_texture_gans_tpu.utils.watchdog import StallWatchdog


def make(clock, **kw):
    kw.setdefault("min_grace_s", 10.0)
    kw.setdefault("factor", 5.0)
    return StallWatchdog(clock=clock, **kw)


def test_no_warning_before_first_beat():
    """Compile can take minutes before the first epoch — silent until then."""
    t = [0.0]
    wd = make(lambda: t[0])
    t[0] = 10_000.0
    assert wd.check() is None


def test_warns_once_per_episode_and_rearms_after_beat():
    t = [0.0]
    wd = make(lambda: t[0])
    wd.beat()  # t=0
    t[0] = 2.0
    wd.beat()  # interval 2s -> threshold max(10, 5*2) = 10
    t[0] = 11.0
    assert wd.check() is None  # 9s since last beat < 10
    t[0] = 13.0
    msg = wd.check()
    assert msg is not None and "no training progress" in msg
    t[0] = 50.0
    assert wd.check() is None  # same episode: warned already
    wd.beat()  # progress resumes
    t[0] = 50.0 + 200.0
    assert wd.check() is not None  # new episode warns again


def test_threshold_tracks_median_interval():
    t = [0.0]
    wd = make(lambda: t[0], min_grace_s=1.0, factor=10.0)
    for i in range(1, 6):
        t[0] = float(i)  # 1s epochs
        wd.beat()
    assert wd.threshold_s() == 10.0  # 10 * median(1s)
    t[0] += 9.0
    assert wd.check() is None
    t[0] += 2.0
    assert wd.check() is not None


def test_thread_wrapper_warns_and_stops():
    msgs = []
    wd = StallWatchdog(
        min_grace_s=0.05, factor=1.0, poll_s=0.02, warn=msgs.append
    )
    wd.start()
    wd.beat()
    deadline = time.time() + 5.0
    while not msgs and time.time() < deadline:
        time.sleep(0.02)
    wd.stop()
    assert msgs and "no training progress" in msgs[0]


def test_train_loop_beats_and_stops_watchdog(tmp_path, monkeypatch):
    """train() beats the watchdog on every epoch-metrics fetch and joins
    the thread on exit (a leaked poller would outlive the run)."""
    from infinite_texture_gans_tpu.data.synthetic import write_texture
    from infinite_texture_gans_tpu.train import train_loop
    from tests.test_train import tiny_args

    events = []

    class Spy(StallWatchdog):
        def beat(self):
            events.append("beat")
            super().beat()

        def stop(self):
            events.append("stop")
            super().stop()

    monkeypatch.setattr(train_loop, "StallWatchdog", Spy)
    tex = write_texture(str(tmp_path / "tex.png"), 64, 64)
    args = tiny_args(
        data_path=tex, data_ext="png", epochs=2, saving_rate=None,
        fname=str(tmp_path / "cp"), seed=4, batch_size=2, sampling=4,
        ema=False,
    )
    train_loop.train(args)
    assert events.count("beat") == args.epochs  # one real sync per epoch
    assert events[-1] == "stop"
