"""Object base class (reference include/psdr/object.h:6-24).

The reference gives every scene object a common base carrying ``type_name``,
``to_string``, an ``m_id`` string and a ``log`` helper.  Here the same
surface exists for API compatibility; concrete classes store their id in the
plain ``id`` attribute (the param-map key) and ``m_id`` aliases it.
"""

from __future__ import annotations


class Object:
    """Common base for Mesh/BSDF/Emitter/Sensor/Scene/Integrator."""

    id: str = ""

    def type_name(self) -> str:
        return type(self).__name__

    @property
    def m_id(self) -> str:
        return self.id

    @m_id.setter
    def m_id(self, value: str):
        self.id = value

    def to_string(self) -> str:
        return self.type_name()

    def __repr__(self) -> str:
        return self.to_string()

    def log(self, msg: str, level: int = 0):
        """Reference Object::log (object.h:12-14): class-name-prefixed print,
        gated by the caller's log level."""
        if level > 0:
            print(f"[{self.type_name()}] {msg}")
