"""Driver-side plan-construction fast path (guide §1.2: after the
algorithm and the per-task work, the headline queries' remaining cost
is FIXED driver time — plan construction chatter, not data).

py4j resolves JVM names with one reflection round trip per *access*:

* ``JVMView.__getattr__`` (``sc._jvm.PythonUtils``, and pyspark's
  ``getattr(sc._jvm, "org.apache.spark.sql.functions")`` inside every
  single ``F.<fn>`` call) sends REFL_GET_UNKNOWN per access;
* ``JavaClass.__getattr__`` (``functions.lit``, ``PythonUtils.toSeq``)
  sends REFL_GET_MEMBER per access.

Both resolve to STATELESS handles — ``JavaClass``/``JavaPackage`` wrap
a fully-qualified name + gateway client, ``JavaMember`` a static-method
name + client — so re-resolution buys nothing: measured on this box,
``F.lit(x)`` costs ~1.0 ms fresh (2 reflection trips + the call) vs
~0.25 ms with pre-resolved handles (the call alone). Across a headline
query's ~100-2700 build round trips that is most of the build wall.

``install()`` caches resolved handles in the *owner instance's*
``__dict__`` so the next access is a plain Python attribute hit (zero
round trips, zero wrapper overhead — ``__getattr__`` only fires on
misses). What is cached and why it is safe:

* JVMView: SUCCESS_PACKAGE / SUCCESS_CLASS answers only. A name's
  class-ness is fixed for the life of the JVM.
* JavaClass: static METHOD members and nested classes only. Static
  FIELD reads return live values and are never cached; errors
  propagate uncached.

Invalidation is structural: handles are cached on the view/class
*instance*, which dies with its gateway — a restarted JVM builds new
JVMView/JavaClass objects with empty caches. No TTLs, no keys to
invalidate. This memoizes protocol handles, never plans, rows, or
results.
"""

from __future__ import annotations

_installed = False


def install() -> None:
    global _installed
    if _installed:
        return
    _installed = True

    from py4j.java_gateway import JavaClass, JavaMember, JavaPackage, JVMView

    view_orig = JVMView.__getattr__

    def view_getattr(self, name):
        result = view_orig(self, name)
        if isinstance(result, (JavaClass, JavaPackage)):
            self.__dict__[name] = result
        return result

    cls_orig = JavaClass.__getattr__

    def cls_getattr(self, name):
        result = cls_orig(self, name)
        # JavaMember = static method, JavaClass = nested class: both are
        # stateless name+gateway handles. Anything else (a static field
        # read) is a live value — do not cache.
        if isinstance(result, (JavaMember, JavaClass)):
            self.__dict__[name] = result
        return result

    JVMView.__getattr__ = view_getattr
    JavaClass.__getattr__ = cls_getattr

    # pyspark converts a bare string column argument (F.sum("x"),
    # df.select("x"), ...) to a JVM Column via functions.col(name) on
    # EVERY call — one round trip per string arg. The JVM Column handle
    # is an immutable unresolved attribute, identical wherever the same
    # name appears, so cache it per (JVM view, name). Bounded; a
    # restarted JVM changes the view id and starts a fresh map.
    from pyspark.sql.classic import column as _classic_column

    jcol_cache: dict = {}
    jcol_epoch: list = [None]
    orig_from_name = _classic_column._create_column_from_name

    def cached_from_name(name):
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        epoch = id(sc._jvm) if sc is not None else None
        if jcol_epoch[0] != epoch:
            jcol_cache.clear()
            jcol_epoch[0] = epoch
        jc = jcol_cache.get(name)
        if jc is None:
            if len(jcol_cache) > 8192:
                jcol_cache.clear()
            jc = jcol_cache[name] = orig_from_name(name)
        return jc

    _classic_column._create_column_from_name = cached_from_name
