import faulthandler

import pytest


@pytest.fixture(autouse=True)
def _hang_watchdog():
    """Ray 2.49.2 occasionally deadlocks on rapid actor-pool teardown
    (driver stuck in WaitForActorRefDeleted after a worker logs
    "Mismatched ActorID: ignoring KillActor"). No single test
    legitimately runs 15 minutes; dump all stacks and abort instead of
    stalling the whole suite."""
    faulthandler.dump_traceback_later(900, exit=True)
    yield
    faulthandler.cancel_dump_traceback_later()


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: tests own
    their Ray session; library code never calls ray.init)."""
    import os

    import ray

    # dodge the Ray 2.49.2 actor-teardown deadlock (see _hang_watchdog):
    # the racing partner is the raylet's idle-worker reaper killing the
    # worker just as the actor-pool shutdown's KillActor arrives
    # ("Mismatched ActorID"); with reaping off the race window closes
    os.environ.setdefault("RAY_kill_idle_workers_interval_ms", "0")
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        import ray.data

        ctx = ray.data.DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    yield
    ray.shutdown()
