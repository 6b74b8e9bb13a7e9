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
    import ray

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
